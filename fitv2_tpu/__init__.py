"""fitv2_tpu: TPU-native FiT/FiTv2 diffusion-transformer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
DogyunPark/FiTv2 (flexible diffusion transformers with flow matching,
variable-resolution token sequences, 2D-RoPE extrapolation, LwD/BFM research
extensions), designed mesh-first for TPU:

  fitv2_tpu.models   — FiT/FiTv2 backbones, RoPE, blocks (flax.linen)
  fitv2_tpu.flow     — transport (paths, losses), ODE/SDE samplers
  fitv2_tpu.sched    — flow-match sigma ladders, IDDPM (FiTv1)
  fitv2_tpu.ops      — attention + Pallas kernels
  fitv2_tpu.parallel — device mesh, DP/FSDP/TP shardings, multihost
  fitv2_tpu.train    — jitted train step, optimizers, LR schedules, EMA
  fitv2_tpu.data     — latent shards, resumable deterministic loader
  fitv2_tpu.ckpt     — orbax manager + PyTorch checkpoint importer
  fitv2_tpu.vae      — SD-VAE (AutoencoderKL) for on-device decode
  fitv2_tpu.sample   — bucketed sampling pipelines, FID generation
  fitv2_tpu.eval     — FID/IS/precision/recall statistics
  fitv2_tpu.utils    — config instantiation, training stats
"""

__version__ = '0.1.0'
