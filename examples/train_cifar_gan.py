"""GAN-assisted LwD training on CIFAR-10 pixels.

Executable recipe mirroring /root/reference/train_fitv2_lwd_cifar_gan.py:
a segmented FiTLwD student trained with reflow targets in PIXEL space
(CIFAR 32x32 -> 16x16 tokens of 2x2x3 patches) plus a PatchGAN
discriminator on the segment's one-step prediction (hinge loss, adaptive
weighting via fitv2_tpu.losses). StyleGAN's bias_act/upfirdn2d CUDA ops used
by the reference discriminator path map to fitv2_tpu.ops equivalents.

Usage:
    python examples/train_cifar_gan.py --cifar /data/cifar10 --steps 1000
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--cifar', required=True,
                   help='dir containing cifar-10-batches-py/')
    p.add_argument('--steps', type=int, default=1000)
    p.add_argument('--batch', type=int, default=64)
    p.add_argument('--lr', type=float, default=1e-4)
    p.add_argument('--disc-start', type=int, default=200)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from fitv2_tpu.data.imagenet import cifar10_loader
    from fitv2_tpu.losses import LPIPSWithDiscriminator2D, NLayerDiscriminator
    from fitv2_tpu.models.fit_lwd import FiTLwD
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    from fitv2_tpu.train import (
        OptimizerConfig, SegmentSampler, create_train_state, make_optimizer)
    from fitv2_tpu.train.gan_train_step import (
        create_disc_state, make_gan_steps)

    # CIFAR pixel-space LwD: 32x32x3 -> 16x16 tokens of p=2 patches
    model = FiTLwD(context_size=256, patch_size=2, in_channels=3,
                   hidden_size=384, depth=12, num_heads=6, num_classes=10,
                   number_of_perflow=4, n_patch_h=16, n_patch_w=16,
                   adaln_type='lora', adaln_lora_dim=96, max_cached_len=32)
    B = args.batch
    grid, mask, size = make_grid_mask_size(B, 16, 16, 256)
    seg_sampler = SegmentSampler(model.number_of_perflow, seed=args.seed)
    sigmas = model.sigmas

    def patchify(img):  # (B, 32, 32, 3) -> (B, 256, 12)
        b = img.shape[0]
        x = img.reshape(b, 16, 2, 16, 2, 3)
        x = jnp.einsum('bhpwqc->bhwcpq', x)
        return x.reshape(b, 256, 12)

    def unpatchify(tok):
        b = tok.shape[0]
        x = tok.reshape(b, 16, 16, 3, 2, 2)
        x = jnp.einsum('bhwcpq->bhpwqc', x)
        return x.reshape(b, 32, 32, 3)

    def gen_loss_for(i: int):
      def gen_loss_fn(params, batch, rng):
        k_x0, k_r, k_drop = jax.random.split(rng, 3)
        x1 = patchify(batch['image'])
        y = batch['label']
        s_cur, s_next = float(sigmas[i]), float(sigmas[i + 1])
        x0 = jax.random.normal(k_x0, x1.shape, x1.dtype)
        xt_in = x0 * (1 - s_cur) + x1 * s_cur
        xt = x0 * (1 - s_next) + x1 * s_next
        r = jax.random.uniform(k_r, (x1.shape[0],), x1.dtype)
        t_input = s_cur + r * (s_next - s_cur)
        rb = r[:, None, None]
        x_input = xt_in * (1 - rb) + xt * rb
        target = (xt - xt_in) / (s_next - s_cur)
        pred, _ = model.apply(
            {'params': params}, x_input, t_input, y, i, grid, mask, size,
            True, rngs={'label_dropout': k_drop},
            method=model.forward_run_layer)
        flow_loss = jnp.mean((pred.astype(jnp.float32)
                              - target.astype(jnp.float32)) ** 2)
        # one-step segment-end estimate feeds the discriminator
        fake = unpatchify(x_input + (s_next - s_cur) * pred)
        return flow_loss, jnp.clip(fake, -1, 1)
      return gen_loss_fn

    disc = NLayerDiscriminator(input_nc=3, ndf=64, n_layers=3)
    gen_tx = make_optimizer(OptimizerConfig(learning_rate=args.lr))
    disc_tx = optax.adam(args.lr, b1=0.5, b2=0.9)
    loss_cfg = LPIPSWithDiscriminator2D(disc_start=args.disc_start,
                                        disc_factor=1.0, disc_weight=0.1)
    per_seg = [make_gan_steps(gen_loss_for(k), disc, gen_tx, disc_tx,
                              loss_cfg)
               for k in range(model.number_of_perflow)]
    disc_step_fn = per_seg[0][1]

    loader = cifar10_loader(args.cifar, B, seed=args.seed)
    first = next(loader)
    example = {k: jnp.asarray(v) for k, v in first.items()}
    params = model.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        patchify(example['image'])[:1], jnp.zeros((1,)),
        example['label'][:1], grid[:1], mask[:1], size[:1])['params']
    state = create_train_state(params, gen_tx)
    disc_state = create_disc_state(disc, disc_tx, jax.random.PRNGKey(3),
                                   example['image'])

    gen_jit = {k: jax.jit(per_seg[k][0])
               for k in range(model.number_of_perflow)}
    disc_jit = jax.jit(disc_step_fn)
    fake_fn = {k: jax.jit(lambda p, b, r, k=k: gen_loss_for(k)(p, b, r)[1])
               for k in range(model.number_of_perflow)}

    rng = jax.random.PRNGKey(args.seed)
    for step, batch_np in enumerate(loader):
        if step >= args.steps:
            break
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        seg = seg_sampler()
        state, gm = gen_jit[seg](state, disc_state, batch, rng)
        fake = fake_fn[seg](state.params, batch, rng)
        disc_state, dm = disc_jit(disc_state, batch['image'], fake,
                                  state.step)
        if step % 50 == 0:
            print(f"step {step}: gen={float(gm['loss']):.4f} "
                  f"base={float(gm['base_loss']):.4f} "
                  f"d={float(dm['d_loss']):.4f}", flush=True)
    print('done')


if __name__ == '__main__':
    main()
