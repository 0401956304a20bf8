"""Multi-host data sharding + prediction-gather encoding.

The gather itself needs a real pod; what we can prove single-process is
(a) the row encoding round-trips exactly (the part that was broken in the
reference-style process_allgather-of-objects design) and (b) shard_indices
partitions the dataset the way torch's DistributedSampler does
(ref: train/train.py:325-330,418-419).
"""

import numpy as np

from icl_speech_text_llm_tpu.parallel.multihost import (
    decode_rows,
    encode_rows,
    gather_predictions,
    shard_indices,
)

ROWS = [
    {"text": "hello world", "true_label": "positive", "predicted_label": "neutral",
     "dataset_type": "voxceleb"},
    {"text": "ünïcödé — spéech", "true_label": "negative", "predicted_label": "negative",
     "dataset_type": "voxceleb_greek"},
    {"text": "", "true_label": "a, b", "predicted_label": "a,b,c", "dataset_type": "hvb"},
]


def test_row_encoding_round_trip():
    buf = encode_rows(ROWS)
    assert buf.dtype == np.uint8
    assert decode_rows(buf, buf.size) == ROWS


def test_row_encoding_round_trip_with_padding():
    buf = encode_rows(ROWS)
    padded = np.concatenate([buf, np.zeros(37, np.uint8)])
    assert decode_rows(padded, buf.size) == ROWS


def test_gather_predictions_single_host_noop():
    assert gather_predictions(ROWS) == ROWS


def test_shard_indices_partition_exact():
    n, pc = 20, 4
    shards = [shard_indices(n, epoch=1, process_id=p, num_processes=pc) for p in range(pc)]
    assert all(len(s) == n // pc for s in shards)
    assert sorted(np.concatenate(shards).tolist()) == sorted(range(n))


def test_shard_indices_wraps_remainder():
    n, pc = 10, 4  # pads 10 → 12 by wrapping, like DistributedSampler
    shards = [shard_indices(n, epoch=0, process_id=p, num_processes=pc) for p in range(pc)]
    assert all(len(s) == 3 for s in shards)
    union = set(np.concatenate(shards).tolist())
    assert union == set(range(n))  # every sample covered at least once


def test_shard_indices_epoch_reshuffle_deterministic():
    a0 = shard_indices(50, epoch=0, process_id=0, num_processes=2)
    a0_again = shard_indices(50, epoch=0, process_id=0, num_processes=2)
    a1 = shard_indices(50, epoch=1, process_id=0, num_processes=2)
    np.testing.assert_array_equal(a0, a0_again)  # same epoch → same order
    assert a0.tolist() != a1.tolist()  # new epoch → new order (set_epoch)


def test_shard_indices_no_shuffle_is_strided():
    shards = [shard_indices(8, shuffle=False, process_id=p, num_processes=2)
              for p in range(2)]
    assert shards[0].tolist() == [0, 2, 4, 6]
    assert shards[1].tolist() == [1, 3, 5, 7]


def test_shard_indices_single_host_full():
    idx = shard_indices(16, epoch=0, shuffle=False, process_id=0, num_processes=1)
    assert idx.tolist() == list(range(16))
