"""v1t_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for large-scale
mouse V1 response prediction, with the full capability surface of the
bryanlimy/V1T reference (TMLR 2023) re-designed TPU-first.

Subpackages
-----------
- ``v1t_tpu.configs``   typed config tree + args.yaml replay contract
- ``v1t_tpu.data``      zip-backed Sensorium/Franke2022 loaders, packed-array
                        cache, per-mouse statistics ("data card"), transforms
- ``v1t_tpu.ops``       TPU compute primitives: grid_sample (align_corners
                        bilinear/nearest), fused Pallas flash attention (LSA +
                        probability export), activation/regularization ops
- ``v1t_tpu.models``    cores (vit/cct/stacked2d/stn/...), readouts
                        (gaussian2d/dense/linear/random), cropper, shifters,
                        full Model assembly (flax.linen)
- ``v1t_tpu.losses``    poisson / msse / correlation criteria with ds-scaling
- ``v1t_tpu.metrics``   Sensorium challenge metrics (numpy oracle semantics)
- ``v1t_tpu.parallel``  mesh/sharding layer: DP over ICI with psum gradients
- ``v1t_tpu.train``     trainer: cycle schedule, grad accumulation, AdamW
                        param groups, plateau scheduler, checkpointing
"""

__version__ = "0.1.0"
