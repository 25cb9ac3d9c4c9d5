"""Image cropper + per-mouse image shifters.

Capability parity with reference src/v1t/models/image_cropper.py:
- a fixed sampling mesh of extent ±center_crop (build_grid,
  image_cropper.py:103-111), translated per sample by a per-mouse
  ``ImageShifter`` MLP (pupil_center -> (dx, dy) * max_shift, 3 layers, Tanh;
  takes behavior ⊕ pupil_center in shift_mode 4; image_cropper.py:10-47),
- nearest-neighbor align_corners=True grid_sample (image_cropper.py:133),
- optional bilinear resize to (36, 64) — skipped for franke2022
  (image_cropper.py:96-99),
- behavior_mode 1 appends the 3 behavior variables as constant image channels
  (image_cropper.py:136-139).
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from v1t_tpu.ops.grid_sample import grid_sample, resize_bilinear


class ImageShifter(nn.Module):
    max_shift: float
    shift_mode: int
    hidden_features: int = 10
    num_layers: int = 3
    dtype: t.Any = None

    @nn.compact
    def __call__(self, behaviors: jax.Array, pupil_centers: jax.Array) -> jax.Array:
        assert 0 <= self.max_shift <= 1
        inputs = pupil_centers
        if self.shift_mode == 4:
            inputs = jnp.concatenate([behaviors, pupil_centers], axis=-1)
        # torch default Linear init (the reference sets no custom init in
        # image_cropper.py)
        from v1t_tpu.ops.common import (
            torch_default_bias_init,
            torch_default_kernel_init,
        )

        x = inputs
        for i in range(self.num_layers - 1):
            x = nn.Dense(
                self.hidden_features, dtype=self.dtype,
                kernel_init=torch_default_kernel_init,
                bias_init=torch_default_bias_init(x.shape[-1]),
                name=f"fc{i}",
            )(x)
            x = jnp.tanh(x)
        x = nn.Dense(
            2, dtype=self.dtype,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(x.shape[-1]),
            name=f"fc{self.num_layers - 1}",
        )(x)
        x = jnp.tanh(x)
        return x * self.max_shift


class ImageCropper(nn.Module):
    """shift_mode: 0 none / 1 cropper shifter / 2 core-readout shifter only /
    3 both / 4 both + cropper sees behavior (reference model.py:51-58)."""

    input_shape: t.Tuple[int, int, int]  # raw (C, H, W)
    mouse_ids: t.Tuple[str, ...]
    shift_mode: int = 0
    behavior_mode: int = 0
    center_crop: float = 1.0
    resize_image: int = 1
    ds_name: str = "sensorium"
    dtype: t.Any = None

    @property
    def crop_shape(self) -> t.Tuple[int, int]:
        _, in_h, in_w = self.input_shape
        if self.center_crop < 1:
            return int(in_h * self.center_crop), int(in_w * self.center_crop)
        return in_h, in_w

    @property
    def do_resize(self) -> bool:
        return self.resize_image == 1 and self.ds_name != "franke2022"

    @property
    def output_shape(self) -> t.Tuple[int, int, int]:
        c = self.input_shape[0]
        if self.behavior_mode == 1:
            c += 3
        out_h, out_w = (36, 64) if self.do_resize else self.crop_shape
        return (c, out_h, out_w)

    @property
    def has_shifter(self) -> bool:
        return self.shift_mode in (1, 3, 4)

    def _build_grid(self) -> np.ndarray:
        """Fixed sampling mesh of extent ±center_crop
        (image_cropper.py:103-111)."""
        crop_h, crop_w = self.crop_shape
        s = self.center_crop
        h_pixels = np.linspace(-s, s, crop_h, dtype=np.float32)
        w_pixels = np.linspace(-s, s, crop_w, dtype=np.float32)
        mesh_y, mesh_x = np.meshgrid(h_pixels, w_pixels, indexing="ij")
        # grid_sample uses (x, y) coordinate ordering
        return np.stack([mesh_x, mesh_y], axis=2)[None]  # (1, h, w, 2)

    @nn.compact
    def __call__(
        self,
        inputs: jax.Array,
        mouse_id: str,
        behaviors: jax.Array,
        pupil_centers: jax.Array,
    ) -> t.Tuple[jax.Array, jax.Array]:
        b = inputs.shape[0]
        grid = jnp.tile(jnp.asarray(self._build_grid()), (b, 1, 1, 1))
        if self.has_shifter:
            max_shift = 1.0 - self.center_crop
            shifts = ImageShifter(
                max_shift=max_shift,
                shift_mode=self.shift_mode,
                num_layers=3,
                dtype=self.dtype,
                name=f"image_shifter_{mouse_id}",
            )(behaviors=behaviors, pupil_centers=pupil_centers)
            grid = grid + shifts[:, None, None, :]
        outputs = grid_sample(inputs, grid, mode="nearest")
        if self.do_resize:
            outputs = resize_bilinear(outputs, 36, 64)
        if self.behavior_mode == 1:
            h, w = outputs.shape[2], outputs.shape[3]
            channels = jnp.tile(
                behaviors[:, :, None, None].astype(outputs.dtype), (1, 1, h, w)
            )
            outputs = jnp.concatenate([outputs, channels], axis=1)
        return outputs, grid

    @staticmethod
    def regularizer(params: dict, mouse_id: str, reg_scale: float) -> jax.Array:
        """L1 over the mouse's shifter parameters (image_cropper.py:38-39,
        113-118); zero when no shifter exists."""
        key = f"image_shifter_{mouse_id}"
        if key not in params:
            return jnp.zeros(())
        leaves = jax.tree_util.tree_leaves(params[key])
        from v1t_tpu.ops.common import l1_sum

        return reg_scale * sum(l1_sum(p) for p in leaves)
