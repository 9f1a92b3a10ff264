"""divergen_tpu — TPU-native JAX framework with the capabilities of aim-uofa/DiverGen.

Rebuilds the five-stage generative-augmentation pipeline for long-tailed
instance segmentation (DiverGen CVPR'24 + BSGAL ICML'24) as an idiomatic
JAX/XLA/Pallas/pjit stack:

  1. generation   — per-category text-to-image diffusion (SDXL-style UNet)
  2. segmentation — SAM corner-prompted instance-mask extraction
  3. filteration  — CLIP score + inter-similarity filtering
  4. training     — CenterNet2 proposals + Detic cascade heads on FPN backbones,
                    on-device copy-paste compositor, pjit data parallelism
  5. active       — BSGAL gradient-cache sample selection, on-device

Design stance (vs the PyTorch/detectron2 reference): static shapes everywhere
(padded Instances pytrees with validity masks), all augmentation/compositing
on-device as vmapped ops, one jax.sharding.Mesh reused by every stage.
"""

__version__ = "0.1.0"
