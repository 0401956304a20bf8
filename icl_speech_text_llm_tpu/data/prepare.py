"""One-time dataset preparation (ref: utils/process_datasets.py:10-271).

Downloads SLUE-phase-2 subsets from the HF hub, normalizes columns to the
schemas the task catalog expects, and ``save_to_disk``s them under the data
root. Requires network access (run outside air-gapped environments) — every
other part of the framework consumes only the on-disk output.
"""

from __future__ import annotations

import argparse
import logging
import os

from ..registry import DatasetSplit, DatasetType, get_dataset_config

logger = logging.getLogger(__name__)

HUB_SOURCES = {
    # subset name on asapp/slue-phase-2 → our dataset type
    "sqa5": DatasetType.SQA,
    "vp_nel": DatasetType.VP_NEL,
    "hvb": DatasetType.HVB,
    "meld": DatasetType.MELD,
}

MELD_HUB = "zrr1999/MELD_Text_Audio"
MELD_EMOTIONS = {0: "neutral", 1: "joy", 2: "sadness", 3: "anger",
                 4: "fear", 5: "disgust", 6: "surprise"}
MELD_SENTIMENTS = {0: "neutral", 1: "positive", 2: "negative"}


def prepare_sqa(split: str, out_dir: str):
    """(ref: utils/process_datasets.py:10-93) — keep unique_id/answer/time-span
    columns, attach question+document audio."""
    from datasets import load_dataset as hf_load

    ds = hf_load("asapp/slue-phase-2", "sqa5", split=split)
    keep = [
        "unique_id", "question_id", "document_id", "normalized_question_text",
        "normalized_document_text", "answer_text", "answer_spans",
        "question_audio", "document_audio", "question_speaker_id",
        "document_speaker_id",
    ]
    drop = [c for c in ds.column_names if c not in keep]
    ds = ds.remove_columns(drop)
    ds.save_to_disk(out_dir)
    logger.info(f"saved sqa5/{split}: {len(ds)} rows → {out_dir}")


def prepare_vp_nel(split: str, out_dir: str):
    """(ref: utils/process_datasets.py:94-165)"""
    from datasets import load_dataset as hf_load

    ds = hf_load("asapp/slue-phase-2", "vp_nel", split=split)
    ds.save_to_disk(out_dir)
    logger.info(f"saved vp_nel/{split}: {len(ds)} rows → {out_dir}")


def prepare_meld(split: str, out_dir: str, source: str = MELD_HUB):
    """(ref: utils/process_datasets.py:166-271) — MELD from the hub dataset or
    a local CSV: filter rows whose audio file is missing, add
    ``unique_id`` (meld_<basename>), and map the integer emotion/sentiment
    columns to the text labels the task catalog expects."""
    from datasets import Dataset, load_dataset as hf_load

    if source.endswith(".csv"):
        import pandas as pd

        ds = Dataset.from_pandas(pd.read_csv(source))
    else:
        ds = hf_load(source, split=split)

    if "path" in ds.column_names:
        valid = [i for i, p in enumerate(ds["path"]) if p and os.path.exists(p)]
        if len(valid) < len(ds):
            logger.warning(f"dropping {len(ds) - len(valid)} rows with missing audio")
            ds = ds.select(valid)
        ds = ds.add_column(
            "unique_id",
            [f"meld_{os.path.splitext(os.path.basename(p))[0]}" for p in ds["path"]],
        )
    elif "unique_id" not in ds.column_names:
        ds = ds.add_column("unique_id", [f"meld_{i}" for i in range(len(ds))])

    if "emotion" in ds.column_names and "emotion_label" not in ds.column_names:
        ds = ds.add_column(
            "emotion_label", [MELD_EMOTIONS.get(int(e), "unknown") for e in ds["emotion"]])
    if "sentiment" in ds.column_names and "sentiment_label" not in ds.column_names:
        ds = ds.add_column(
            "sentiment_label",
            [MELD_SENTIMENTS.get(int(s), "unknown") for s in ds["sentiment"]])
    ds.save_to_disk(out_dir)
    logger.info(f"saved meld/{split}: {len(ds)} rows → {out_dir}")
    return ds


def build_fewshots(dataset_type: DatasetType, split: str, out_dir: str,
                   k: int = 10, pool_split: str = "train"):
    """Emit the ``*_embedding_topk{k}`` layout the ICL dataset consumes:
    retrieval-ranked exemplars attached per item
    (ref: archive/utils/generate_fewshots.py:69-112,218)."""
    from datasets import Dataset

    from .fewshot_retrieval import build_fewshot_dataset
    from .sources import load_dataset

    cfg = get_dataset_config(dataset_type)
    items = list(load_dataset(dataset_type, DatasetSplit(split)))
    pool_is_self = pool_split == split
    pool = (items if pool_is_self
            else list(load_dataset(dataset_type, DatasetSplit(pool_split))))
    rows = build_fewshot_dataset(items, pool, dataset_type, k=k,
                                 pool_is_self=pool_is_self)
    Dataset.from_list(rows).save_to_disk(out_dir)
    logger.info(f"saved {cfg.name if hasattr(cfg, 'name') else dataset_type.value}"
                f"/{split} topk{k} fewshots: {len(rows)} rows → {out_dir}")
    return rows


def prepare_generic(subset: str, split: str, out_dir: str):
    from datasets import load_dataset as hf_load

    ds = hf_load("asapp/slue-phase-2", subset, split=split)
    ds.save_to_disk(out_dir)
    logger.info(f"saved {subset}/{split}: {len(ds)} rows → {out_dir}")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Prepare SLUE datasets from the HF hub")
    p.add_argument("--subset", type=str, required=True, choices=sorted(HUB_SOURCES))
    p.add_argument("--split", type=str, default="validation")
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--source", type=str, default=None,
                   help="meld: hub dataset name or local CSV path")
    p.add_argument("--build_fewshots", action="store_true",
                   help="emit the *_embedding_topk{k} fewshot layout instead "
                        "of the raw dataset (requires the raw data on disk)")
    p.add_argument("--k", type=int, default=10, help="fewshot exemplars per item")
    p.add_argument("--pool_split", type=str, default="train",
                   help="exemplar source split for --build_fewshots")
    args = p.parse_args(argv)

    dt = HUB_SOURCES[args.subset]
    cfg = get_dataset_config(dt)
    split = DatasetSplit(args.split)
    out_dir = args.out_dir or cfg.get_path(split)
    os.makedirs(os.path.dirname(out_dir), exist_ok=True)
    if args.build_fewshots:
        build_fewshots(dt, args.split, out_dir, k=args.k, pool_split=args.pool_split)
    elif args.subset == "sqa5":
        prepare_sqa(args.split, out_dir)
    elif args.subset == "vp_nel":
        prepare_vp_nel(args.split, out_dir)
    elif args.subset == "meld":
        prepare_meld(args.split, out_dir, source=args.source or MELD_HUB)
    else:
        prepare_generic(args.subset, args.split, out_dir)


if __name__ == "__main__":
    main()
