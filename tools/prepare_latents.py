"""Pre-encode an image folder into FiT latent shards (safetensors).

Produces the dataset layout the trainer consumes (the reference ships
pre-encoded latents via tools/download_in1k_latents_*.sh; this tool creates
the same structure from raw images with the JAX SD-VAE encoder):

  out_dir/from_16_to_{target_len}/NNNNNN.safetensors with
    feature (2, h, w, 16): [unflipped, flipped] VAE moments (mean||logvar
                           scaled) matching in1k_latent_dataset.py:44-69
    grid (2, N), size (2,), label ()

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


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--images', required=True, help='class-per-folder root')
    p.add_argument('--vae', required=True, help='sd-vae safetensors/bin')
    p.add_argument('--out', required=True)
    p.add_argument('--target-len', type=int, default=256)
    p.add_argument('--patch-size', type=int, default=2)
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--max-images', type=int, default=None)
    p.add_argument('--mode', default='resize', choices=['resize', 'crop'])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from fitv2_tpu.data.imagenet import ImagenetDataset
    from fitv2_tpu.models.grid_utils import make_grid
    from fitv2_tpu.vae import AutoencoderKL, load_vae_params

    max_side = int(np.sqrt(args.target_len)) * args.patch_size * 8
    ds = ImagenetDataset(
        args.images, image_size=max_side,
        mode='center_crop' if args.mode == 'crop' else 'resize')
    vae = AutoencoderKL()
    params = load_vae_params(args.vae)

    @jax.jit
    def encode(x):
        mean, logvar = vae.apply({'params': params}, x, method=vae.encode)
        return mean * 0.18215, logvar

    sub = osp.join(args.out, f'from_16_to_{args.target_len}')
    os.makedirs(sub, exist_ok=True)
    n = min(len(ds), args.max_images or len(ds))
    for i in range(n):
        s = ds[i]
        img = s['jpg'].astype(np.float32) / 127.5 - 1.0
        both = np.stack([img, img[:, ::-1]])  # unflipped + hflip
        mean, _ = encode(jnp.asarray(both))
        mean = np.asarray(mean)  # (2, h/8, w/8, 4)
        lh, lw = mean.shape[1], mean.shape[2]
        p = args.patch_size
        gh, gw = lh // p, lw // p
        # (2, gh, gw, p*p*4) token features
        feat = mean.reshape(2, gh, p, gw, p, 4)
        feat = feat.transpose(0, 1, 3, 5, 2, 4).reshape(2, gh, gw, 4 * p * p)
        grid = make_grid(gh, gw).astype(np.int32)
        save_file({
            'feature': feat.astype(np.float32),
            'grid': grid,
            'size': np.array([gh, gw], np.int32),
            'label': np.array(int(s['cls']), np.int32),
        }, osp.join(sub, f'{i:06d}.safetensors'))
        if i % 100 == 0:
            print(f'{i}/{n}', flush=True)
    print('done:', sub)


if __name__ == '__main__':
    main()
