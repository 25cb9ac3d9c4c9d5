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


def test_fused_choose_blocks_whole_sequence():
    from v1t_tpu.ops.fused_mha import WHOLE_SEQ_MAX, _choose_blocks

    # V1T shape: lane-tile alignment only, one q and one k block
    assert _choose_blocks(1654) == (1664, 1664, 1664)
    assert _choose_blocks(300) == (384, 384, 384)
    # beyond the VMEM cap: 256-row blocked mode
    npad, bq, bk = _choose_blocks(WHOLE_SEQ_MAX + 1)
    assert bq == 256 and npad % bq == 0 and npad % bk == 0


def test_fused_block_k_env_override_is_validated(monkeypatch):
    # V1T_FUSED_BLOCK_K is captured ONCE at import (so the traced kernel
    # config cannot diverge from what args.yaml records mid-process); tests
    # patch the captured module constant
    import v1t_tpu.ops.fused_mha as mha

    # npad 1664 = 128 * 13 -> the only 128-aligned proper divisor is 128
    monkeypatch.setattr(mha, "_FUSED_BLOCK_K_OVERRIDE", 128)
    assert mha._choose_blocks(1654) == (1664, 1664, 128)
    # args.yaml records the env var as the effective kernel config, so an
    # invalid value must raise instead of silently falling back (832 divides
    # 1664 but is not lane-tile aligned; 512 is aligned but doesn't divide)
    import pytest

    for bad in (832, 512):
        monkeypatch.setattr(mha, "_FUSED_BLOCK_K_OVERRIDE", bad)
        with pytest.raises(ValueError):
            mha._choose_blocks(1654)


def test_fused_mlp_choose_rows():
    from v1t_tpu.ops.fused_mlp import BLOCK_R, WHOLE_ROWS_MAX, _block_r, _choose_rows

    assert _choose_rows(1654) == 1664
    assert _block_r(1664) == 1664
    big = _choose_rows(WHOLE_ROWS_MAX + 1)
    assert big % BLOCK_R == 0 and _block_r(big) == BLOCK_R


def test_pad_once_gating_implies_fused_dispatch():
    """Transformer.pad_once and Attention.use_fused share one predicate:
    whenever pad-once would activate, the attention dispatch must accept
    (pad-once REQUIRES the fused path — a drift would raise at trace time)."""
    import jax.numpy as jnp

    from v1t_tpu.models.cores.vit import (
        FUSED_MAX_N,
        WHOLE_SEQ_MAX,
        _fused_attention_eligible,
    )
    from v1t_tpu.ops.fused_mha import _choose_blocks

    assert WHOLE_SEQ_MAX <= FUSED_MAX_N
    for n in (33, 300, 1654, WHOLE_SEQ_MAX):
        npad = _choose_blocks(n)[0]
        if npad <= WHOLE_SEQ_MAX:
            # same predicate evaluated at npad (pad-once) and at the padded
            # runtime length (dispatch) must agree for every impl/dtype
            for impl in ("auto", "pallas", "xla"):
                a = _fused_attention_eligible(jnp.bfloat16, impl, npad)
                b = _fused_attention_eligible(jnp.bfloat16, impl, npad)
                assert a == b


def test_interp_matmul_table_cap():
    """Tables beyond the VMEM-resident cap must raise (the readout's auto
    dispatch falls back to XLA gathers for full-resolution feature maps)."""
    import jax.numpy as jnp
    import pytest

    from v1t_tpu.ops.interp_matmul import MAX_TABLE_ROWS, interp_matmul_sample_cm

    flat = jnp.zeros((1, 8, MAX_TABLE_ROWS + 1), jnp.float32)
    grid = jnp.zeros((1, 4, 2), jnp.float32)
    with pytest.raises(ValueError):
        interp_matmul_sample_cm(flat, grid, height=1, width=MAX_TABLE_ROWS + 1)
