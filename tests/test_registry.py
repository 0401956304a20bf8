"""Task catalog tests: structure, variants, swap pinning."""

import pytest

from icl_speech_text_llm_tpu.registry import (
    DATASET_CONFIGS,
    DatasetConfig,
    DatasetSplit,
    DatasetType,
    get_dataset_config,
    get_swap_config,
    apply_label_mapping,
    parse_dataset_types,
    set_data_root,
)


def test_all_dataset_types_resolvable():
    for dt in DatasetType:
        cfg = get_dataset_config(dt)
        assert cfg is not None, dt
        assert isinstance(cfg, DatasetConfig)
        assert cfg.prompt_template
        assert cfg.completion_key
        assert cfg.text_key


def test_label_spaces():
    assert get_dataset_config(DatasetType.VOXCELEB).valid_labels == [
        "positive", "negative", "neutral",
    ]
    assert len(get_dataset_config(DatasetType.HVB).valid_labels) == 18
    assert len(get_dataset_config(DatasetType.VOXPOPULI).valid_labels) == 7
    assert len(get_dataset_config(DatasetType.MELD_EMOTION).valid_labels) == 7
    assert get_dataset_config(DatasetType.SQA).valid_labels is None
    assert get_dataset_config(DatasetType.VP_NEL).valid_labels is None


def test_greek_mappings_are_bijections():
    for dt in [
        DatasetType.VOXCELEB_GREEK,
        DatasetType.HVB_GREEK,
        DatasetType.VOXPOPULI_GREEK,
        DatasetType.MELD_GREEK,
        DatasetType.MELD_EMOTION_GREEK,
    ]:
        cfg = get_dataset_config(dt)
        mapping = cfg.label_mapping
        assert mapping, dt
        assert sorted(mapping.values()) == sorted(cfg.valid_labels)
        assert len(set(mapping.values())) == len(mapping)


def test_swap_config_pinned_when_not_randomized():
    # Non-randomized swap resolution pins permutation index 1
    # (ref: data/voxceleb_config.py:168-173 et al.)
    a = get_swap_config(DatasetType.VOXCELEB_SWAP)
    b = get_swap_config(DatasetType.VOXCELEB_SWAP)
    assert a.valid_labels == b.valid_labels == ["beta", "gamma", "alpha"]
    hvb = get_swap_config(DatasetType.HVB_SWAP)
    assert hvb.valid_labels[0] == "question_check"
    vp = get_swap_config(DatasetType.VOXPOPULI_SWAP)
    assert vp.valid_labels == ["zeta2", "zeta3", "zeta4", "zeta5", "zeta6", "zeta7", "zeta1"]


def test_swap_templates_render_permutation():
    cfg = get_swap_config(DatasetType.VOXCELEB_SWAP)
    for label in cfg.valid_labels:
        assert label in cfg.prompt_template
    assert cfg.label_mapping["positive"] == cfg.valid_labels[0]


def test_swap_randomize_draws_from_family():
    seen = {tuple(get_swap_config(DatasetType.VOXCELEB_SWAP, randomize=True).valid_labels)
            for _ in range(50)}
    assert len(seen) > 1


def test_apply_label_mapping_by_field():
    mapping = {"positive": "alpha", "acknowledge": "foo"}
    examples = [
        {"sentiment": "positive"},
        {"sentiment_label": "positive"},
        {"emotion_label": "positive"},
        {"dialog_acts": "acknowledge, thanks"},
        {"normalized_combined_ner": "positive"},
    ]
    out = apply_label_mapping(examples, mapping)
    assert out[0]["sentiment"] == "alpha"
    assert out[1]["sentiment_label"] == "alpha"
    assert out[2]["emotion_label"] == "alpha"
    assert out[3]["dialog_acts"] == "foo,thanks"
    assert out[4]["normalized_combined_ner"] == "alpha"


def test_parse_dataset_types_accepts_both_separators():
    # The reference used '-' in CLIs and ',' elsewhere (SURVEY.md §8 item 6)
    assert parse_dataset_types("voxceleb-hvb") == [DatasetType.VOXCELEB, DatasetType.HVB]
    assert parse_dataset_types("voxceleb,hvb") == [DatasetType.VOXCELEB, DatasetType.HVB]
    with pytest.raises(ValueError):
        parse_dataset_types("nonexistent")


def test_paths_resolve_against_data_root(tmp_path):
    set_data_root(str(tmp_path))
    try:
        cfg = get_dataset_config(DatasetType.VOXCELEB)
        assert cfg.get_path(DatasetSplit.TRAIN).startswith(str(tmp_path))
        assert cfg.get_audio_lookup_path(DatasetSplit.TEST).startswith(str(tmp_path))
    finally:
        set_data_root("data")


def test_sqa_vp_nel_auxiliary_keys():
    sqa = get_dataset_config(DatasetType.SQA)
    assert sqa.additional_text_keys == {"question": "normalized_question_text"}
    assert sqa.output_format == "timestamps_pair"
    nel = get_dataset_config(DatasetType.VP_NEL)
    assert nel.output_format == "entity_timestamps"
    assert DatasetSplit.TRAIN not in nel.paths
