"""CPU-testable flash-attention configuration logic (the kernels themselves
are exercised in tests_tpu/ on hardware)."""

import numpy as np

from v1t_tpu.ops.flash_attention import _fullk_fits, _round_up, pick_blocks


def test_pick_blocks_v1t_shape():
    bq, bk = pick_blocks(1654)
    assert bq == 256 and bk == 896
    assert bq % 128 == 0 and bk % 128 == 0


def test_pick_blocks_small_sequences():
    # small N: one block covering the (128-rounded) sequence
    assert pick_blocks(121) == (128, 128)
    assert pick_blocks(256) == (256, 256)
    assert pick_blocks(500) == (256, 512)


def test_pick_blocks_huge_sequences_capped():
    bq, bk = pick_blocks(34114)  # full-resolution token count
    assert bq == 256 and bk == 896


def test_fullk_budget():
    # V1T shapes fit in both dtypes
    assert _fullk_fits(_round_up(1654, 896), 256, 2)  # bf16
    assert _fullk_fits(_round_up(1654, 896), 256, 4)  # fp32
    # full-resolution 34k tokens do not (fall back to blocked path)
    assert not _fullk_fits(_round_up(34114, 896), 256, 2)
