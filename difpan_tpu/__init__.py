"""difpan_tpu — a TPU-native (JAX/XLA/Pallas) framework for diffusion-based
multi-source image fusion (pansharpening + multispectral/hyperspectral fusion).

Re-designed from scratch for TPU with the capabilities of the DDIF reference
(294coder/Dif-PAN): supervised conditional DDPM with disentangled modulations
(CSM/FWM), DDPM/DDIM/DPM-Solver sampling, PAN/MS/HSI data pipelines, metrics,
and train/eval engines.

Design principles (TPU-first):
  * NHWC layouts everywhere; bf16-friendly compute; static shapes.
  * Stateless, functional core: noise schedules are pytrees, respacing is
    value-semantics (the reference mutates its schedule buffers in place,
    see /root/reference/diffusion/diffusion_ddpm_pan.py:583-592).
  * Whole sampling chains compile to a single device program (`lax.scan`),
    no host round-trips per step.
  * Parallelism via `jax.sharding.Mesh` + collectives over ICI, not wrappers.
"""

__version__ = "0.1.0"
