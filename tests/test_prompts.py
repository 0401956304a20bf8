"""Prompt assembly parity + PromptPlan structure tests."""

import json
import os

import pytest

from icl_speech_text_llm_tpu.data.prompts import (
    DOC_SLOT,
    EXAMPLE_SLOT,
    MAIN_SLOT,
    QUESTION_SLOT,
    build_default_prompt,
    build_sqa_prompt,
    format_prompt,
)
from icl_speech_text_llm_tpu.registry import DatasetType

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "prompts.json")

EXAMPLES = [
    {"text": "i love this", "label": "positive"},
    {"text": "terrible day", "label": "negative"},
    {"text": "it is wednesday", "label": "neutral"},
]
SQA_EXAMPLES = [
    {"document": "the sky is blue", "question": "what color is the sky", "completion": "blue"},
    {"document": "cats purr", "question": "what do cats do", "completion": "purr"},
]
TEMPLATE = "TEMPLATE_HEAD instructions here."


def test_format_prompt_parity_with_reference():
    with open(GOLDEN) as f:
        cases = json.load(f)
    assert len(cases) == 24
    for case in cases:
        exs = ([] if case["n_examples"] == 0
               else (SQA_EXAMPLES if case["kind"] == "sqa" else EXAMPLES))
        if case["kind"] == "sqa":
            got = format_prompt(
                TEMPLATE, "doc text", examples=exs, input_mode=case["input_mode"],
                fewshot_mode=case["fewshot_mode"], dataset_type=DatasetType.SQA,
                question="the question?",
            )
        else:
            got = format_prompt(
                TEMPLATE, "the main utterance", examples=exs,
                input_mode=case["input_mode"], fewshot_mode=case["fewshot_mode"],
                dataset_type=DatasetType.VOXCELEB,
            )
        assert got == case["prompt"], case


def test_default_plan_structure_speech_fewshot():
    plan = build_default_prompt(
        TEMPLATE, "main", EXAMPLES, input_mode="speech_only", fewshot_mode="speech"
    )
    # k example slots + 1 main slot, segments = slots + 1
    assert plan.slots == [(EXAMPLE_SLOT, 0), (EXAMPLE_SLOT, 1), (EXAMPLE_SLOT, 2), (MAIN_SLOT, 0)]
    assert len(plan.segments) == 5
    # re-render: joining segments with markers reproduces the prompt
    markers = ["<Example0>", "<Example1>", "<Example2>", "<SpeechHere>"]
    rebuilt = plan.segments[0]
    for marker, seg in zip(markers, plan.segments[1:]):
        rebuilt += marker + seg
    assert rebuilt == plan.prompt


def test_default_plan_text_fewshot_has_single_main_slot():
    plan = build_default_prompt(
        TEMPLATE, "main", EXAMPLES, input_mode="speech_only", fewshot_mode="text"
    )
    assert plan.slots == [(MAIN_SLOT, 0)]
    assert len(plan.segments) == 2
    assert "Text: i love this" in plan.prompt


def test_default_plan_text_only_has_no_slots():
    plan = build_default_prompt(
        TEMPLATE, "main", EXAMPLES, input_mode="text_only", fewshot_mode="text"
    )
    assert plan.slots == []
    assert plan.segments == [plan.prompt]


def test_sqa_plan_structure():
    plan = build_sqa_prompt(
        TEMPLATE, "doc", "q?", SQA_EXAMPLES, input_mode="speech_only", fewshot_mode="speech"
    )
    assert plan.slots == [
        (DOC_SLOT, 0), (QUESTION_SLOT, 0),
        (DOC_SLOT, 1), (QUESTION_SLOT, 1),
        (DOC_SLOT, -1), (QUESTION_SLOT, -1),
    ]
    assert len(plan.segments) == 7


def test_sqa_stray_gt_quirk_preserved():
    # ref emits "Question: ><Speech>" in speech-fewshot SQA examples
    # (data/model_processors.py:705) — parity quirk
    plan = build_sqa_prompt(
        TEMPLATE, "doc", "q?", SQA_EXAMPLES, input_mode="speech_only", fewshot_mode="speech"
    )
    assert "Question: ><Speech>" in plan.prompt


def test_split_prompt_plan_roundtrip():
    """split_prompt_plan: prefix carries the exemplar block + its audio
    slots, suffix carries the query + main slot, and segments/slots
    reassemble to the original plan."""
    from icl_speech_text_llm_tpu.data.prompts import (
        QUERY_MARKER, build_default_prompt, split_prompt_plan)

    examples = [{"text": f"t{i}", "label": "positive"} for i in range(3)]
    plan = build_default_prompt(
        "Classify the emotion.", "query utterance", examples,
        input_mode="speech_only", fewshot_mode="speech",
    )
    prefix, suffix = split_prompt_plan(plan)
    assert [s for s in prefix.slots] == [("example", i) for i in range(3)]
    assert suffix.slots == [("main", 0)]
    assert suffix.segments[0].startswith(QUERY_MARKER)
    # reassembly: segments interleave with slots exactly as before the split
    joined_segments = (prefix.segments[:-1]
                       + [prefix.segments[-1] + suffix.segments[0]]
                       + suffix.segments[1:])
    assert joined_segments == plan.segments
    assert prefix.slots + suffix.slots == plan.slots
    assert prefix.prompt + suffix.prompt == plan.prompt


def test_split_prompt_plan_no_marker_raises():
    from icl_speech_text_llm_tpu.data.prompts import (
        PromptPlan, split_prompt_plan)
    import pytest

    with pytest.raises(ValueError):
        split_prompt_plan(PromptPlan(segments=["no marker"], slots=[],
                                     prompt="no marker"))
