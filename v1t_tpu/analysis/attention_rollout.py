"""Attention rollout (https://arxiv.org/abs/2005.00928) for the V1T core —
interpretability parity with reference src/v1t/utils/attention_rollout.py.

The reference's ``Recorder`` forward-hooks every Attention softmax
(attention_rollout.py:15-77); here the core's attention exports the
post-softmax probabilities directly via the ``return_probs`` path of the XLA
attention (the dual-path design: the fused Pallas kernel never materializes
probabilities, so the interpretability driver uses the einsum path).

Rollout math (attention_rollout.py:92-133, reproduced exactly):
max over heads -> + identity -> row-normalize -> cumulative matmul across
blocks -> CLS row -> reshape via find_shape -> min-max normalize -> bilinear
resize to the image shape.
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
import numpy as np

from v1t_tpu.ops.common import find_shape
from v1t_tpu.ops.grid_sample import resize_bilinear


def normalize(x: np.ndarray) -> np.ndarray:
    return (x - x.min()) / (x.max() - x.min())


def attention_rollout(
    attention: np.ndarray, image_shape: t.Sequence[int]
) -> np.ndarray:
    """One sample: (blocks, heads, P, P) softmax probs -> (H, W) heatmap."""
    assert attention.ndim == 4
    # max over attention heads
    attention = attention.max(axis=1)  # (blocks, P, P)

    # account for residual connections: add identity, re-normalize rows
    residual = np.eye(attention.shape[1], dtype=attention.dtype)
    aug = attention + residual
    aug = aug / aug.sum(axis=-1, keepdims=True)

    # recursively multiply across blocks
    joint = aug[0]
    for n in range(1, aug.shape[0]):
        joint = aug[n] @ joint

    heatmap = joint[0, 1:]  # CLS row, without CLS column
    heatmap = heatmap.reshape(find_shape(len(heatmap)))
    heatmap = normalize(heatmap)
    resized = resize_bilinear(
        jnp.asarray(heatmap, jnp.float32)[None, None], *image_shape
    )
    return np.asarray(resized[0, 0])


def attention_rollouts(
    attentions: np.ndarray, image_shape: t.Sequence[int]
) -> np.ndarray:
    """Batch of (B, blocks, heads, P, P) -> (B, H, W) heatmaps."""
    assert attentions.ndim == 5
    return np.stack(
        [attention_rollout(a, image_shape=image_shape) for a in attentions]
    )


def extract_attention_maps(
    loader,
    model,
    params: dict,
    model_state: t.Optional[dict] = None,
    num_samples: t.Optional[int] = None,
    verbose: int = 1,
) -> t.Dict[str, np.ndarray]:
    """Attention rollout maps for every sample of a loader (reference
    attention_rollout.py:136-201): run the cropper manually, record the core's
    attention probabilities, roll out per sample; images/behaviors/pupil
    centers are returned UN-standardized."""
    ds = loader.dataset
    mouse_id = ds.mouse_id
    state = model_state or {}

    import functools

    @functools.partial(jax.jit)
    def step(params, images, behaviors, pupil_centers):
        cropped, _ = model.apply(
            {"params": params, **state},
            images,
            mouse_id=mouse_id,
            behaviors=behaviors,
            pupil_centers=pupil_centers,
            method="crop",
        )
        _, probs = model.apply(
            {"params": params, **state},
            cropped,
            mouse_id=mouse_id,
            behaviors=behaviors,
            pupil_centers=pupil_centers,
            train=False,
            return_probs=True,
            method="core_forward",
        )
        return cropped, probs

    results: dict = {"images": [], "heatmaps": [], "pupil_centers": [],
                     "behaviors": []}
    count = num_samples
    for batch in loader:
        images = jnp.asarray(batch["image"])
        behaviors = jnp.asarray(batch["behavior"])
        pupils = jnp.asarray(batch["pupil_center"])
        cropped, probs = step(params, images, behaviors, pupils)
        heatmaps = attention_rollouts(
            np.asarray(probs, np.float32), image_shape=cropped.shape[2:]
        )
        results["images"].append(ds.i_transform_image(np.asarray(cropped)))
        results["heatmaps"].append(heatmaps)
        results["behaviors"].append(
            ds.i_transform_behavior(np.asarray(behaviors))
        )
        results["pupil_centers"].append(
            ds.i_transform_pupil_center(np.asarray(pupils))
        )
        if num_samples is not None and (count := count - len(images)) <= 0:
            break

    results = {k: np.vstack(v) for k, v in results.items()}
    if num_samples is not None:
        results = {k: v[:num_samples] for k, v in results.items()}
    return results
