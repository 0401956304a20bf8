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
}


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
    args = p.parse_args(argv)

    dt = HUB_SOURCES[args.subset]
    cfg = get_dataset_config(dt)
    split = DatasetSplit(args.split)
    out_dir = args.out_dir or cfg.get_path(split)
    os.makedirs(os.path.dirname(out_dir), exist_ok=True)
    if args.subset == "sqa5":
        prepare_sqa(args.split, out_dir)
    elif args.subset == "vp_nel":
        prepare_vp_nel(args.split, out_dir)
    else:
        prepare_generic(args.subset, args.split, out_dir)


if __name__ == "__main__":
    main()
