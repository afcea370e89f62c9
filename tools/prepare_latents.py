"""Pre-encode an image folder into FiT latent shards (safetensors).

Produces the full three-bucket dataset layout the trainer consumes (the
reference ships pre-encoded latents via tools/download_in1k_latents_*.sh;
this tool creates the same structure from raw images with the JAX SD-VAE
encoder). Bucket routing mirrors the reference loader's expectations
(in1k_latent_dataset.py:51-70 reads the same three dirs):

  out_dir/from_16_to_{L}/              images whose native (16px-quantized)
                                       grid already fits in L tokens —
                                       encoded at native aspect/size
  out_dir/greater_than_{L}_resize/     larger images, aspect-preserving
                                       resize_arr to the max side
  out_dir/greater_than_{L}_crop/       the SAME larger images, ADM square
                                       center_crop_arr — same filename as
                                       the resize version, so the loader's
                                       random resize-vs-crop choice works

Each shard holds exactly what IN1kLatentDataset.get consumes
(fitv2_tpu/data/latent_dataset.py:83-97):
    feature (2, gh, gw, p*p*C): [unflipped, hflipped] scaled VAE latent
                                means, patchified in the model's
                                (c, ph, pw) token order (the inverse of
                                FiT.unpatchify, models/fit.py:289-308)
    grid (2, N) int32, size (2,) int32 = (gh, gw), label () int32

Round-tripped by tests/test_prepare_latents.py: image folder -> this tool
-> IN1kLatentDataset/PrefetchLoader -> one train step.

Usage:
    python tools/prepare_latents.py --images /data/imagenet/train \
        --vae sd-vae-ft-ema.safetensors --out datasets/in1k_latents_256 \
        --target-len 256
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def patchify_latent(mean: np.ndarray, patch_size: int) -> np.ndarray:
    """(B, lh, lw, C) latent -> (B, gh, gw, C*p*p) tokens in the model's
    (c, ph, pw) order — the exact inverse of FiT.unpatchify
    (models/fit.py:303 reshapes the token dim as (C, p, p))."""
    p = patch_size
    b, lh, lw, c = mean.shape
    gh, gw = lh // p, lw // p
    feat = mean.reshape(b, gh, p, gw, p, c)
    # (b, gh, gw, c, ph, pw) -> flatten (c, ph, pw)
    feat = feat.transpose(0, 1, 3, 5, 2, 4)
    return feat.reshape(b, gh, gw, c * p * p)


def quantized_native_tokens(width: int, height: int, token_px: int = 16
                            ) -> int:
    """Token count of the native image after multiple-of-16px quantization
    (1 token = patch_size * vae_factor = 16 px at p=2)."""
    return max(1, width // token_px) * max(1, height // token_px)


def encode_and_write(img_u8: np.ndarray, cls: int, encode_fn, out_path: str,
                     patch_size: int) -> None:
    """Encode [unflipped, hflip] pair and write one shard."""
    from safetensors.numpy import save_file
    img = img_u8.astype(np.float32) / 127.5 - 1.0           # HWC [-1, 1]
    both = np.stack([img, img[:, ::-1]])                    # flip = W axis
    mean = np.asarray(encode_fn(both))                      # (2, lh, lw, C)
    feat = patchify_latent(mean, patch_size)                # (2, gh, gw, D)
    gh, gw = feat.shape[1], feat.shape[2]
    from fitv2_tpu.models.grid_utils import make_grid
    save_file({
        'feature': feat.astype(np.float32),
        'grid': make_grid(gh, gw).astype(np.int32),
        'size': np.array([gh, gw], np.int32),
        'label': np.array(int(cls), np.int32),
    }, out_path)


def prepare_latents(images_root: str, encode_fn, out_dir: str,
                    target_len: int = 256, patch_size: int = 2,
                    max_images: int = None, log_every: int = 100) -> dict:
    """Route every image of a class-per-folder tree into the three buckets.

    encode_fn: (B, H, W, 3) float32 [-1,1] -> (B, H/8, W/8, C) scaled
    latent means (the SD-VAE posterior mean * 0.18215). Returns per-bucket
    shard counts. Images are encoded at their bucket shape; jit recompiles
    per unique (H, W) — fine for a host-side prep tool (shapes quantize to
    multiples of 16 px, so the set is small).
    """
    from fitv2_tpu.data.imagenet import (ImagenetDataset, center_crop_arr,
                                         resize_arr)
    from PIL import Image

    max_side = int(np.sqrt(target_len)) * patch_size * 8
    ds = ImagenetDataset(images_root, image_size=max_side, mode='resize')
    d_small = osp.join(out_dir, f'from_16_to_{target_len}')
    d_resize = osp.join(out_dir, f'greater_than_{target_len}_resize')
    d_crop = osp.join(out_dir, f'greater_than_{target_len}_crop')
    for d in (d_small, d_resize, d_crop):
        os.makedirs(d, exist_ok=True)

    counts = {'small': 0, 'large': 0}
    n = min(len(ds), max_images or len(ds))
    for i in range(n):
        path, cls = ds.samples[i]
        pil = Image.open(path).convert('RGB')
        w, h = pil.size
        name = f'{i:06d}.safetensors'
        if quantized_native_tokens(w, h) <= target_len:
            # native grid already fits: encode at quantized native size
            arr = resize_arr(pil, max_size=max(w, h))
            encode_and_write(arr, cls, encode_fn,
                             osp.join(d_small, name), patch_size)
            counts['small'] += 1
        else:
            # larger image: BOTH preprocessings, same filename, so the
            # loader's random resize-vs-crop choice finds the pair
            arr_r = resize_arr(pil, max_size=max_side)
            encode_and_write(arr_r, cls, encode_fn,
                             osp.join(d_resize, name), patch_size)
            arr_c = center_crop_arr(pil, max_side)
            encode_and_write(arr_c, cls, encode_fn,
                             osp.join(d_crop, name), patch_size)
            counts['large'] += 1
        if log_every and i % log_every == 0:
            print(f'{i}/{n}', flush=True)
    return counts


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--images', required=True, help='class-per-folder root')
    p.add_argument('--vae', required=True, help='sd-vae safetensors/bin')
    p.add_argument('--out', required=True)
    p.add_argument('--target-len', type=int, default=256)
    p.add_argument('--patch-size', type=int, default=2)
    p.add_argument('--max-images', type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from fitv2_tpu.vae import AutoencoderKL, load_vae_params

    vae = AutoencoderKL()
    params = load_vae_params(args.vae)

    @jax.jit
    def encode(x):
        mean, _logvar = vae.apply({'params': params}, x, method=vae.encode)
        return mean * 0.18215

    counts = prepare_latents(args.images, encode, args.out,
                             target_len=args.target_len,
                             patch_size=args.patch_size,
                             max_images=args.max_images)
    print('done:', args.out, counts)


if __name__ == '__main__':
    main()
