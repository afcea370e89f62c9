"""SD-VAE (AutoencoderKL) for on-device latent decode/encode."""

from fitv2_tpu.vae.autoencoder_kl import (
    SD_VAE_SCALE, AutoencoderKL, Decoder, Encoder, latents_to_images_uint8,
    sample_latent,
)
from fitv2_tpu.vae.torch_import import convert_vae_state_dict, load_vae_params

__all__ = [
    'SD_VAE_SCALE', 'AutoencoderKL', 'Decoder', 'Encoder',
    'latents_to_images_uint8', 'sample_latent', 'convert_vae_state_dict',
    'load_vae_params',
]
