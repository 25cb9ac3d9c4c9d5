"""V1T core — the flagship Vision Transformer with per-block behavior
modulation, re-designed for TPU.

Capability parity with reference src/v1t/models/core/vit.py:
- ``Image2Patches``: 4 patch modes (unfold / conv / shifted-patch-tokenization
  / dual patch-norm), CLS token, learnable positional embedding added to every
  token including CLS, embedding dropout (vit.py:41-129).
- ``Attention``: pre-LN, bias-free fused QKV with inner_dim = emb_dim *
  num_heads (per-head dim = emb_dim — unusually wide, vit.py:218-224), scale
  emb_dim^-0.5, optional LSA (learnable per-head temperature + diagonal mask,
  vit.py:234-261), attention dropout, projection + dropout.
- ``BehaviorMLP``: 3- or 5-dim behavior state -> emb_dim latent, tanh MLP;
  shared across mice (modes 2/3) or per-mouse (mode 4) (vit.py:157-202).
- Block: x += behavior_latent; x = DropPath(MHA(x)) + x;
  x = DropPath(MLP(x)) + x (vit.py:348-362).
- Output: drop CLS, reshape tokens to a (C, h, w) feature map via the largest
  factor pair of num_patches (vit.py:411-417, 423-436).

TPU-first differences from the reference:
- attention runs through a blockwise Pallas flash kernel (O(N) memory, bf16
  matmuls, fp32 accumulation) instead of materializing the (1654, 1654)
  attention matrix under torch AMP + per-attention gradient checkpointing.
- dropout/droppath use explicit JAX PRNG streams.
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from v1t_tpu.models.registry import register_core
from v1t_tpu.ops.attention import multi_head_attention
from v1t_tpu.ops.fused_mha import WHOLE_SEQ_MAX, _choose_blocks, fused_mha
from v1t_tpu.ops.fused_mlp import fused_mlp
from v1t_tpu.ops.common import (
    l1_sum,
    drop_path,
    find_shape,
    torch_default_bias_init,
    torch_default_kernel_init,
    unfold_output_size,
    unfold_patches,
)

Dtype = t.Any

# beyond this the fused attention kernel's whole-sequence K/V (+ fp32
# dK/dV in the backward) VMEM scratch overflows — full-resolution runs
# (34k tokens, SURVEY §5.7) must take the composed flash path
FUSED_MAX_N = 4096


def _fused_attention_eligible(
    dtype, attention_impl: str, n: int, backend: t.Optional[str] = None
) -> bool:
    """Single source of truth for fused attention-sublayer gating, shared by
    the Transformer's pad-once decision and Attention's dispatch so the two
    cannot drift (pad-once REQUIRES the fused path downstream). ``backend``
    overrides the live backend so CPU-mesh dry runs can assert the fused
    path WOULD engage on TPU at a given config."""
    from v1t_tpu.ops.common import interpret_enabled

    return (
        attention_impl in ("auto", "pallas")
        and dtype == jnp.bfloat16
        and ((backend or jax.default_backend()) == "tpu" or interpret_enabled())
        and n <= FUSED_MAX_N
    )

def sp_bypasses_fused_attention(config, num_tokens: int) -> bool:
    """True when ``--sequence_parallel`` would bypass a fused attention
    sublayer kernel that WOULD have engaged on a single chip at this token
    count — i.e. SP is costing single-chip kernel speed in exchange for
    token sharding. The SP bodies (parallel/sequence.py) take the
    composed-projection path by design: the fused kernel holds the whole
    (npad, npad) score block in VMEM, which is exactly what token sharding
    exists to avoid, so fusing it under a seq mesh would cap SP at the
    shapes that don't need SP. At full-resolution token counts
    (> FUSED_MAX_N) nothing is given up. train.py warns on this predicate;
    pinned by tests/test_sequence_parallel.py."""
    dtype = jnp.bfloat16 if config.precision == "bf16" else None
    return _fused_attention_eligible(
        dtype, config.attention_impl, num_tokens, backend="tpu"
    )


trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def _dense(features: int, use_bias: bool = True, dtype: Dtype = None, name=None):
    """Dense layer with the reference Transformer init: trunc_normal(0.02)
    weights, zero bias (reference vit.py:338-346)."""
    return nn.Dense(
        features=features,
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=trunc_normal_init,
        bias_init=nn.initializers.zeros,
        name=name,
    )


def _torch_dense(features: int, fan_in: int, dtype: Dtype = None, name=None):
    """Dense with torch's DEFAULT Linear init — the reference's
    Image2Patches applies custom init only to Conv2d (vit.py:118-120), so
    its Linear projections keep kaiming_uniform(a=sqrt(5)) weights and
    U(+-1/sqrt(fan_in)) bias."""
    return nn.Dense(
        features=features,
        dtype=dtype,
        kernel_init=torch_default_kernel_init,
        bias_init=torch_default_bias_init(fan_in),
        name=name,
    )


def patch_shift(images: jax.Array, patch_size: int) -> jax.Array:
    """Shifted Patch Tokenization: concat the image with its four diagonal
    half-patch shifts (zero padded) along channels (reference vit.py:15-38)."""
    shift = patch_size // 2
    padded = jnp.pad(
        images, ((0, 0), (0, 0), (shift, shift), (shift, shift)), mode="constant"
    )
    left_upper = padded[..., : -shift * 2, : -shift * 2]
    right_upper = padded[..., : -shift * 2, shift * 2 :]
    left_bottom = padded[..., shift * 2 :, : -shift * 2]
    right_bottom = padded[..., shift * 2 :, shift * 2 :]
    return jnp.concatenate(
        [images, left_upper, right_upper, left_bottom, right_bottom], axis=1
    )


class Image2Patches(nn.Module):
    image_shape: t.Tuple[int, int, int]  # (C, H, W)
    patch_mode: int
    patch_size: int
    stride: int
    emb_dim: int
    dropout: float = 0.0
    dtype: Dtype = None

    @property
    def num_patches(self) -> int:
        _, h, w = self.image_shape
        n = unfold_output_size(h, self.patch_size, self.stride) * unfold_output_size(
            w, self.patch_size, self.stride
        )
        return n + 1  # + CLS

    @nn.compact
    def __call__(self, inputs: jax.Array, train: bool = False) -> jax.Array:
        b = inputs.shape[0]
        p, s = self.patch_size, self.stride
        c_in = inputs.shape[1]
        if self.patch_mode == 0:
            patches = unfold_patches(inputs, p, s)
            patches = _torch_dense(
                self.emb_dim, fan_in=c_in * p * p, dtype=self.dtype,
                name="projection",
            )(patches)
        elif self.patch_mode == 1:
            x = jnp.transpose(inputs, (0, 2, 3, 1))  # NCHW -> NHWC
            x = nn.Conv(
                features=self.emb_dim,
                kernel_size=(p, p),
                strides=(s, s),
                padding="VALID",
                dtype=self.dtype,
                # reference init_weight: nn.init.kaiming_normal_ on Conv2d
                # (vit.py:118-120) — fan_in normal, gain sqrt(2); bias keeps
                # the torch default
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_in", "normal"
                ),
                bias_init=torch_default_bias_init(c_in * p * p),
                name="projection",
            )(x)
            patches = x.reshape(b, -1, self.emb_dim)
        elif self.patch_mode == 2:
            shifted = patch_shift(inputs, p)
            patches = unfold_patches(shifted, p, s)
            patches = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(patches)
            patches = _torch_dense(
                self.emb_dim, fan_in=5 * c_in * p * p, dtype=self.dtype,
                name="projection",
            )(patches)
        elif self.patch_mode == 3:
            patches = unfold_patches(inputs, p, s)
            patches = nn.LayerNorm(epsilon=1e-5, name="pre_norm")(patches)
            patches = _torch_dense(
                self.emb_dim, fan_in=c_in * p * p, dtype=self.dtype,
                name="projection",
            )(patches)
            patches = nn.LayerNorm(epsilon=1e-5, name="post_norm")(patches)
        else:
            raise NotImplementedError(f"patch_mode {self.patch_mode} not implemented.")

        # CLS token and positional embedding are ~N(0, 1) like the reference's
        # torch.randn parameters (vit.py:103-105).
        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, self.emb_dim)
        )
        pos_embedding = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=1.0),
            (self.num_patches, self.emb_dim),
        )
        tokens = jnp.concatenate(
            [jnp.tile(cls_token, (b, 1, 1)).astype(patches.dtype), patches], axis=1
        )
        tokens = tokens + pos_embedding.astype(tokens.dtype)
        tokens = nn.Dropout(rate=self.dropout, deterministic=not train)(tokens)
        return tokens


class BehaviorMLP(nn.Module):
    """behavior state -> per-block latent added to every token.

    behavior_mode 2: input (pupil, dpupil, speed); 3: + pupil center (x, y);
    4: like 3 but one MLP per mouse (reference vit.py:157-202).
    """

    behavior_mode: int
    out_dim: int
    mouse_ids: t.Tuple[str, ...]
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, behaviors: jax.Array, mouse_id: str) -> jax.Array:
        assert self.behavior_mode in (2, 3, 4)
        name = mouse_id if self.behavior_mode == 4 else "share"
        x = _dense(
            self.out_dim // 2, use_bias=self.use_bias, dtype=self.dtype,
            name=f"{name}_fc1",
        )(behaviors)
        x = jnp.tanh(x)
        x = _dense(
            self.out_dim, use_bias=self.use_bias, dtype=self.dtype,
            name=f"{name}_fc2",
        )(x)
        return jnp.tanh(x)


class Attention(nn.Module):
    num_patches: int
    emb_dim: int
    num_heads: int = 8
    dropout: float = 0.0
    use_lsa: bool = False
    use_bias: bool = True
    dtype: Dtype = None
    attention_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        inputs: jax.Array,
        train: bool = False,
        return_probs: bool = False,
        n_real: t.Optional[int] = None,
        fold_residual: bool = False,
        bias_row: t.Optional[jax.Array] = None,
    ):
        b, n, _ = inputs.shape
        e, heads = self.emb_dim, self.num_heads
        inner_dim = e * heads

        # raw LayerNorm + projection weights (trunc_normal(0.02) / zero bias
        # like the reference init, vit.py:338-346) so the fused kernel and
        # the composed paths share one parameter tree
        gamma = self.param("ln_scale", nn.initializers.ones, (e,))
        ln_beta = self.param("ln_bias", nn.initializers.zeros, (e,))
        wqkv = self.param("to_qkv_kernel", trunc_normal_init, (e, 3 * inner_dim))
        wp = self.param("projection_kernel", trunc_normal_init, (inner_dim, e))
        bp = (
            self.param("projection_bias", nn.initializers.zeros, (e,))
            if self.use_bias
            else jnp.zeros((e,), jnp.float32)
        )

        base_scale = e**-0.5
        if self.use_lsa:
            # learnable per-head temperature (reference vit.py:236-239)
            scale = self.param(
                "scale",
                lambda key, shape: jnp.full(shape, base_scale, jnp.float32),
                (heads,),
            )
        else:
            scale = jnp.asarray(base_scale, jnp.float32)

        rng = None
        if self.dropout > 0.0 and train:
            rng = self.make_rng("dropout")

        from v1t_tpu.parallel.context import sequence_mesh

        seq_ctx = sequence_mesh()
        dt = self.dtype
        use_fused = (
            seq_ctx is None
            and not return_probs
            and _fused_attention_eligible(dt, self.attention_impl, n)
        )
        if (
            n_real is not None or fold_residual or bias_row is not None
        ) and not use_fused:
            raise ValueError(
                "pad-once (n_real) / fold_residual / bias_row require the "
                "fused attention path"
            )
        if not use_fused:
            # composed paths normalize here; the fused kernel does it inside
            x32 = inputs.astype(jnp.float32)
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.var(x32, axis=-1, keepdims=True)
            x = (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + ln_beta
        if seq_ctx is not None and not return_probs:
            # context parallelism (SURVEY §5.7): shard tokens over the "seq"
            # mesh axis; pad N to the shard multiple (padded keys masked via
            # n_real, padded query rows sliced off)
            from v1t_tpu.parallel import sequence as seqpar

            mesh_, seq_axis, seq_impl, batch_axis = seq_ctx
            if dt is not None:
                x = x.astype(dt)
            qkv = x @ wqkv.astype(x.dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q, k, v = (
                jnp.transpose(y.reshape(b, n, heads, e), (0, 2, 1, 3))
                for y in (q, k, v)
            )
            n_shards = mesh_.shape[seq_axis]
            n_pad = (-n) % n_shards
            if n_pad:
                pad = ((0, 0), (0, 0), (0, n_pad), (0, 0))
                q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
            attn_fn = (
                seqpar.ring_attention
                if seq_impl == "ring"
                else seqpar.allgather_attention
            )
            # fold scale into q like the flash path so the per-head
            # temperature's gradient flows through XLA autodiff
            scale_v = jnp.asarray(scale, jnp.float32).reshape(-1)
            scale_v = jnp.broadcast_to(scale_v, (heads,))
            q = q * scale_v[None, :, None, None].astype(q.dtype)
            out = attn_fn(
                q, k, v, scale=1.0, mesh=mesh_, axis=seq_axis,
                use_lsa=self.use_lsa, n_real=n,
                batch_axis=batch_axis,
                dropout_rate=self.dropout if train else 0.0,
                rng=rng,
            )
            out = out[:, :, :n, :]
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, inner_dim)
            out = out @ wp.astype(out.dtype) + bp.astype(out.dtype)
            probs = None
        elif use_fused:
            out = fused_mha(
                inputs.astype(dt),
                gamma,
                ln_beta,
                wqkv.reshape(e, 3, heads, e).transpose(1, 2, 0, 3).astype(dt),
                wp.reshape(heads, e, e).astype(dt),
                bp.astype(dt),
                scale,
                use_lsa=self.use_lsa,
                dropout_rate=self.dropout,
                deterministic=not train,
                rng=rng,
                n_real=n_real,
                fold_out_dropout=True,
                fold_residual=fold_residual,
                bias_row=bias_row,
            )
            probs = None
        else:
            if dt is not None:
                x = x.astype(dt)
            qkv = x @ wqkv.astype(x.dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def to_heads(y):
                return jnp.transpose(
                    y.reshape(b, n, heads, e), (0, 2, 1, 3)
                )

            q, k, v = to_heads(q), to_heads(k), to_heads(v)
            result = multi_head_attention(
                q,
                k,
                v,
                scale,
                use_lsa=self.use_lsa,
                dropout_rate=self.dropout,
                deterministic=not train,
                rng=rng,
                impl=self.attention_impl,
                return_probs=return_probs,
            )
            out, probs = result if return_probs else (result, None)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, inner_dim)
            out = out @ wp.astype(out.dtype) + bp.astype(out.dtype)

        if not use_fused:
            # the fused kernel applies the output dropout in-kernel
            out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)
        if return_probs:
            return out, probs
        return out


class MLP(nn.Module):
    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(
        self,
        inputs: jax.Array,
        train: bool = False,
        n_real: t.Optional[int] = None,
        fold_residual: bool = False,
    ) -> jax.Array:
        in_dim = inputs.shape[-1]
        gamma = self.param("ln_scale", nn.initializers.ones, (in_dim,))
        beta = self.param("ln_bias", nn.initializers.zeros, (in_dim,))
        w1 = self.param("fc1_kernel", trunc_normal_init, (in_dim, self.hidden_dim))
        w2 = self.param("fc2_kernel", trunc_normal_init, (self.hidden_dim, self.out_dim))
        zeros = nn.initializers.zeros
        b1 = (
            self.param("fc1_bias", zeros, (self.hidden_dim,))
            if self.use_bias else jnp.zeros((self.hidden_dim,), jnp.float32)
        )
        b2 = (
            self.param("fc2_bias", zeros, (self.out_dim,))
            if self.use_bias else jnp.zeros((self.out_dim,), jnp.float32)
        )

        dt = self.dtype
        from v1t_tpu.ops.common import interpret_enabled

        use_fused = dt == jnp.bfloat16 and (
            jax.default_backend() == "tpu" or interpret_enabled()
        )
        rng = None
        if self.dropout > 0.0 and train:
            rng = self.make_rng("dropout")
        if use_fused:
            return fused_mlp(
                inputs.astype(dt), gamma, beta, w1, b1, w2, b2,
                dropout_rate=self.dropout, deterministic=not train, rng=rng,
                n_real=n_real, fold_residual=fold_residual,
            )
        if n_real is not None or fold_residual:
            raise ValueError(
                "pad-once (n_real) / fold_residual require the fused MLP path"
            )
        # composed path (fp32 / CPU): identical math through XLA
        mean = jnp.mean(inputs.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.var(inputs.astype(jnp.float32), axis=-1, keepdims=True)
        x = (inputs.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
        x = x * gamma + beta
        if dt is not None:
            x = x.astype(dt)
        x = x @ w1.astype(x.dtype) + b1.astype(x.dtype)
        # torch nn.GELU default is the exact erf formulation
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(rate=self.dropout, deterministic=not train, rng_collection="dropout")(x)
        x = x @ w2.astype(x.dtype) + b2.astype(x.dtype)
        x = nn.Dropout(rate=self.dropout, deterministic=not train, rng_collection="dropout")(x)
        return x


class Transformer(nn.Module):
    num_patches: int
    emb_dim: int
    num_blocks: int
    num_heads: int
    mlp_dim: int
    dropout: float
    behavior_mode: int
    mouse_ids: t.Tuple[str, ...]
    use_lsa: bool = False
    drop_path_rate: float = 0.0
    use_bias: bool = True
    dtype: Dtype = None
    attention_impl: str = "auto"
    grad_checkpointing: bool = False

    @nn.compact
    def __call__(
        self,
        inputs: jax.Array,
        mouse_id: str,
        behaviors: jax.Array,
        train: bool = False,
        return_probs: bool = False,
    ):
        from v1t_tpu.parallel.context import sequence_mesh

        outputs = inputs
        all_probs = []
        n_tokens = inputs.shape[1]
        # pad-once: when every sublayer runs the fused whole-sequence
        # kernels, pad the residual stream to the kernel row multiple ONCE
        # for the whole transformer instead of pad+slice per sublayer
        # (V1T: 16 pad / 16 slice ops of a 34 MB stream per train step).
        # The kernels zero their pad output rows, so pad rows carry only the
        # per-block behavior latents (bounded by tanh) and every pad-row
        # gradient is exactly zero — see fused_mha/fused_mlp `n_real`.
        npad = _choose_blocks(n_tokens)[0]
        pad_once = (
            not return_probs
            and sequence_mesh() is None
            and _fused_attention_eligible(self.dtype, self.attention_impl, npad)
            and npad <= WHOLE_SEQ_MAX  # whole-sequence mode on both sublayers
        )
        n_real = None
        if pad_once:
            outputs = jnp.pad(
                outputs, ((0, 0), (0, npad - n_tokens), (0, 0))
            )
            n_real = n_tokens
        # fold the residual adds into the kernels (DropPath must be a no-op
        # for `sublayer(x) + x` to be the whole block body)
        fold_res = pad_once and (self.drop_path_rate == 0.0 or not train)
        for i in range(self.num_blocks):
            bias_row = None
            if self.behavior_mode in (2, 3, 4):
                b_latent = BehaviorMLP(
                    behavior_mode=self.behavior_mode,
                    out_dim=self.emb_dim,
                    mouse_ids=self.mouse_ids,
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                    name=f"block{i}_bmlp",
                )(behaviors, mouse_id=mouse_id)
                # added to every token including CLS (reference vit.py:356-359)
                if fold_res:
                    # folded into the attention kernel: its sublayer input
                    # becomes z = x + latent and the emitted residual is z
                    bias_row = b_latent
                else:
                    outputs = outputs + b_latent[:, None, :].astype(
                        outputs.dtype
                    )

            # per-attention gradient checkpointing (reference vit.py:277-284)
            # — largely obsoleted by the O(N)-memory flash kernel, kept for
            # the --grad_checkpointing flag
            attn_cls = Attention
            mlp_cls = MLP
            if self.grad_checkpointing and not return_probs:
                attn_cls = nn.remat(Attention, static_argnums=(2, 3, 4, 5))
                mlp_cls = nn.remat(MLP, static_argnums=(2, 3, 4))
            mha_out = attn_cls(
                num_patches=self.num_patches,
                emb_dim=self.emb_dim,
                num_heads=self.num_heads,
                dropout=self.dropout,
                use_lsa=self.use_lsa,
                use_bias=self.use_bias,
                dtype=self.dtype,
                attention_impl=self.attention_impl,
                name=f"block{i}_mha",
            )(outputs, train, return_probs, n_real, fold_res, bias_row)
            if return_probs:
                mha_out, probs = mha_out
                all_probs.append(probs)
            if fold_res:
                outputs = mha_out  # kernel emitted sublayer(x) + x
            else:
                outputs = self._drop_path(mha_out, train) + outputs

            mlp_out = mlp_cls(
                hidden_dim=self.mlp_dim,
                out_dim=self.emb_dim,
                dropout=self.dropout,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name=f"block{i}_mlp",
            )(outputs, train, n_real, fold_res)
            if fold_res:
                outputs = mlp_out  # kernel emitted sublayer(x) + x
            else:
                outputs = self._drop_path(mlp_out, train) + outputs

        if pad_once:
            outputs = outputs[:, :n_tokens, :]
        if return_probs:
            # (B, blocks, heads, N, N) like the reference Recorder
            # (src/v1t/utils/attention_rollout.py:49-77)
            return outputs, jnp.stack(all_probs, axis=1)
        return outputs

    def _drop_path(self, x: jax.Array, train: bool) -> jax.Array:
        if self.drop_path_rate == 0.0 or not train:
            return x
        return drop_path(
            x,
            rate=self.drop_path_rate,
            deterministic=False,
            rng=self.make_rng("droppath"),
        )


@register_core("vit")
class ViTCore(nn.Module):
    """input (B, C, H, W) images + behavior state -> (B, emb_dim, h, w)
    feature map."""

    image_shape: t.Tuple[int, int, int]
    mouse_ids: t.Tuple[str, ...]
    behavior_mode: int = 0
    patch_mode: int = 0
    patch_size: int = 8
    patch_stride: int = 1
    num_blocks: int = 4
    num_heads: int = 4
    emb_dim: int = 155
    mlp_dim: int = 488
    p_dropout: float = 0.0
    t_dropout: float = 0.0
    drop_path_rate: float = 0.0
    use_lsa: bool = False
    use_bias: bool = True
    dtype: Dtype = None
    attention_impl: str = "auto"
    grad_checkpointing: bool = False

    @classmethod
    def from_config(cls, config, image_shape, mouse_ids, dtype=None):
        return cls(
            image_shape=tuple(image_shape),
            mouse_ids=tuple(mouse_ids),
            behavior_mode=config.behavior_mode,
            patch_mode=config.patch_mode,
            patch_size=config.patch_size,
            patch_stride=config.patch_stride,
            num_blocks=config.num_blocks,
            num_heads=config.num_heads,
            emb_dim=config.emb_dim,
            mlp_dim=config.mlp_dim,
            p_dropout=config.p_dropout,
            t_dropout=config.t_dropout,
            drop_path_rate=config.drop_path,
            use_lsa=config.use_lsa,
            use_bias=not config.disable_bias,
            dtype=dtype,
            attention_impl=config.attention_impl,
            grad_checkpointing=bool(config.grad_checkpointing),
        )

    @property
    def num_patches(self) -> int:
        _, h, w = self.image_shape
        return unfold_output_size(h, self.patch_size, self.patch_stride) * (
            unfold_output_size(w, self.patch_size, self.patch_stride)
        )

    @property
    def output_shape(self) -> t.Tuple[int, int, int]:
        h, w = find_shape(self.num_patches)
        return (self.emb_dim, h, w)

    @nn.compact
    def __call__(
        self,
        inputs: jax.Array,
        mouse_id: str,
        behaviors: jax.Array,
        pupil_centers: jax.Array,
        train: bool = False,
        return_probs: bool = False,
    ):
        tokens = Image2Patches(
            image_shape=self.image_shape,
            patch_mode=self.patch_mode,
            patch_size=self.patch_size,
            stride=self.patch_stride,
            emb_dim=self.emb_dim,
            dropout=self.p_dropout,
            dtype=self.dtype,
            name="patch_embedding",
        )(inputs, train=train)

        if self.behavior_mode in (3, 4):
            behaviors = jnp.concatenate([behaviors, pupil_centers], axis=-1)

        outputs = Transformer(
            num_patches=self.num_patches + 1,
            emb_dim=self.emb_dim,
            num_blocks=self.num_blocks,
            num_heads=self.num_heads,
            mlp_dim=self.mlp_dim,
            dropout=self.t_dropout,
            behavior_mode=self.behavior_mode,
            mouse_ids=self.mouse_ids,
            use_lsa=self.use_lsa,
            drop_path_rate=self.drop_path_rate,
            use_bias=self.use_bias,
            dtype=self.dtype,
            attention_impl=self.attention_impl,
            grad_checkpointing=self.grad_checkpointing,
            name="transformer",
        )(tokens, mouse_id=mouse_id, behaviors=behaviors, train=train,
          return_probs=return_probs)
        if return_probs:
            outputs, probs = outputs

        outputs = outputs[:, 1:, :]  # drop CLS token
        b = outputs.shape[0]
        h, w = find_shape(self.num_patches)
        # (B, h*w, C) -> (B, C, h, w) (reference vit.py:408, 435)
        outputs = jnp.transpose(
            outputs.reshape(b, h, w, self.emb_dim), (0, 3, 1, 2)
        )
        if return_probs:
            return outputs, probs
        return outputs

    @staticmethod
    def regularizer(params: dict, reg_scale: float) -> jax.Array:
        """L1 over ALL core parameters (reference vit.py:419-421)."""
        leaves = jax.tree_util.tree_leaves(params)
        return reg_scale * sum(l1_sum(p) for p in leaves)
