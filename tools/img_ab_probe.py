"""Image-space serving-mode A/B with Inception-feature Frechet distances
(round-5 VERDICT #7: upgrade the synthetic-Gaussian probe).

The round-4 probe (tools/serving_ab_probe.py) measured serving-mode
distribution damage on a token-space Gaussian mixture with a random-MLP
embedding — right kind of evidence, weak discriminative power (FD floor
8.15 vs deltas ~1). This probe tightens it the CIFAR way the verdict
asked for, within what the sandbox allows:

  ENVIRONMENT CAVEAT: real CIFAR-10 cannot enter this sandbox (zero
  egress; no cifar-10-batches-py anywhere in the image, torchvision not
  installed). Substitute: procedurally rendered 32x32x3 SCENES with
  natural-image statistics — per-class color palettes, per-mode shape
  geometry (multimodal by construction), vertical illumination gradients,
  instance color/position jitter, and 1/f spatial texture noise. Unlike
  the Gaussian mixture, these have edges, textures, and pixel-value
  statistics in uint8 image range, and the feature extractor is the REAL
  in-tree InceptionV3 (eval/inception.py, fixed random init — a valid
  discriminative embedding for Frechet statistics; same caveat as the
  rest of the no-egress eval chain).

Protocol (mirrors serving_ab_probe, image-space):
  1. Render train set; train a small pixel-space FiTv2 (32x32x3, patch 2
     -> 256 tokens of dim 12) by flow matching with class dropout.
  2. Generate N per serving mode through sample/pipeline.build_sampler:
     dense bf16 | int8cal | int8+interval[.3,.9] | int8+extrap2 |
     composed serving-max.
  3. Score each against a held-out real draw: Inception-pool3 FD,
     mode coverage / conditional accuracy / chi^2 (nearest mode template
     in pixel space), with the REAL-vs-REAL FD floor printed first.

Run (TPU): python tools/img_ab_probe.py [train_steps]
"""

import os as _os, sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_REPO_ROOT, _os.path.join(_REPO_ROOT, 'tools')):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)

try:
    from fitv2_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(_REPO_ROOT)
except Exception:
    pass

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _env(name, default, cast=int):
    return cast(_os.environ.get(name, default))


N_CLASSES = _env('IAB_CLASSES', 10)
N_MODES = _env('IAB_MODES', 4)            # per class (shape position)
IMG = 32
PATCH = 2
N_HW = IMG // PATCH                        # 16x16 token grid
N_CTX = N_HW * N_HW
TOKEN_DIM = PATCH * PATCH * 3
BATCH = _env('IAB_BATCH', 256)
N_GEN = _env('IAB_NGEN', 4096)
SAMPLE_STEPS = _env('IAB_STEPS', 100)
CFG = _env('IAB_CFG', 1.5, float)
TRAIN_STEPS = _env('IAB_TRAIN', 4000)


# -- scene renderer ----------------------------------------------------------

def _palettes(seed=0):
    rng = np.random.Generator(np.random.PCG64(seed))
    fg = rng.uniform(0.25, 1.0, (N_CLASSES, 3))
    bg = rng.uniform(0.0, 0.55, (N_CLASSES, 3))
    # mode geometry: quadrant centers + shape kind (rect/disc alternating)
    cy = np.array([8, 8, 24, 24], np.float32)
    cx = np.array([8, 24, 8, 24], np.float32)
    return fg, bg, cy[:N_MODES], cx[:N_MODES]


_YY, _XX = np.meshgrid(np.arange(IMG, dtype=np.float32),
                       np.arange(IMG, dtype=np.float32), indexing='ij')


def _pink_noise(rng, n):
    """1/f spatial noise, (n, IMG, IMG, 3) — natural-image spectral slope."""
    f = np.fft.fftfreq(IMG)
    fr = np.sqrt(f[:, None] ** 2 + f[None, :] ** 2)
    fr[0, 0] = 1.0
    amp = 1.0 / fr
    spec = (rng.standard_normal((n, IMG, IMG, 3))
            + 1j * rng.standard_normal((n, IMG, IMG, 3)))
    spec *= amp[None, :, :, None]
    x = np.fft.ifft2(spec, axes=(1, 2)).real
    x /= x.std(axis=(1, 2, 3), keepdims=True) + 1e-8
    return x.astype(np.float32)


def render(labels, modes, seed):
    """(n,) labels + (n,) mode ids -> float images in [-1, 1], NHWC."""
    rng = np.random.Generator(np.random.PCG64(seed))
    fg, bg, cy, cx = _palettes()
    n = len(labels)
    fgc = np.clip(fg[labels] + rng.normal(0, 0.06, (n, 3)), 0, 1)
    bgc = np.clip(bg[labels] + rng.normal(0, 0.06, (n, 3)), 0, 1)
    # background: vertical illumination gradient
    grad = (0.75 + 0.5 * _YY / IMG)[None, :, :, None]          # (1,H,W,1)
    img = bgc[:, None, None, :] * grad
    # foreground shape at the mode's quadrant, jittered
    y0 = cy[modes] + rng.normal(0, 1.5, n)
    x0 = cx[modes] + rng.normal(0, 1.5, n)
    r = rng.uniform(4.5, 6.5, n)
    disc = (modes % 2).astype(bool)                             # alternate
    dy = _YY[None] - y0[:, None, None]
    dx = _XX[None] - x0[:, None, None]
    inside_disc = dy ** 2 + dx ** 2 <= (r ** 2)[:, None, None]
    inside_rect = ((np.abs(dy) <= r[:, None, None])
                   & (np.abs(dx) <= r[:, None, None]))
    m = np.where(disc[:, None, None], inside_disc, inside_rect)
    img = np.where(m[..., None], fgc[:, None, None, :] * grad, img)
    img = img + 0.08 * _pink_noise(rng, n)
    return (np.clip(img, 0, 1) * 2.0 - 1.0).astype(np.float32)


def draw_real(n, seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    labels = rng.integers(N_CLASSES, size=n).astype(np.int32)
    modes = rng.integers(N_MODES, size=n).astype(np.int32)
    return render(labels, modes, seed + 7), labels, modes


def to_tokens(img):
    """(n, 32, 32, 3) -> (n, 256, 12) matching FiT.unpatchify's inverse
    (token dim is (c, p, q)-ordered, models/fit.py unpatchify)."""
    n = img.shape[0]
    x = img.reshape(n, N_HW, PATCH, N_HW, PATCH, 3)
    x = x.transpose(0, 1, 3, 5, 2, 4)        # n, gh, gw, c, p, q
    return x.reshape(n, N_CTX, TOKEN_DIM)


def from_latents(arr):
    """build_sampler latents (B, 3, 32, 32) -> images NHWC [-1,1]."""
    return np.asarray(arr, np.float32).transpose(0, 2, 3, 1)


def to_uint8(img):
    return np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)


# -- model / train / generate ------------------------------------------------

def build_model(precision='bf16'):
    from fitv2_tpu.models.fit import FiT
    return FiT(context_size=N_CTX, patch_size=PATCH, in_channels=3,
               hidden_size=256, depth=6, num_heads=4, num_classes=N_CLASSES,
               class_dropout_prob=0.1, learn_sigma=False, use_sit=True,
               use_swiglu=True, q_norm='layernorm', k_norm='layernorm',
               adaln_type='lora', adaln_lora_dim=64, max_cached_len=32,
               dtype=jnp.bfloat16, gemm_precision=precision)


def train(steps):
    from fitv2_tpu.flow import create_transport
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    from fitv2_tpu.train import (OptimizerConfig, create_train_state,
                                 make_optimizer, make_train_step)
    model = build_model()
    grid, mask, size = make_grid_mask_size(BATCH, N_HW, N_HW, N_CTX)
    params = model.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        jnp.zeros((1, N_CTX, TOKEN_DIM)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32), grid[:1], mask[:1], size[:1],
        train=True)['params']
    transport = create_transport('Linear', 'velocity', snr_type='lognorm')
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3))
    state = create_train_state(params, tx)
    step_fn = jax.jit(make_train_step(model, transport, tx, ema_decay=0.999),
                      donate_argnums=0)
    rng = jax.random.PRNGKey(5)
    t0 = time.time()
    for i in range(steps):
        labels = np.random.default_rng(900 + i).integers(
            N_CLASSES, size=BATCH).astype(np.int32)
        modes = np.random.default_rng(1900 + i).integers(
            N_MODES, size=BATCH).astype(np.int32)
        x = to_tokens(render(labels, modes, 5000 + i))
        batch = {'feature': jnp.asarray(x), 'grid': grid, 'mask': mask,
                 'label': jnp.asarray(labels), 'size': size}
        rng, sub = jax.random.split(rng)
        state, m = step_fn(state, batch, sub)
        if i % 500 == 0 or i == steps - 1:
            print(f'train {i}: loss {float(m["loss"]):.4f} '
                  f'({time.time()-t0:.0f}s)', flush=True)
    return build_model(), state.ema_params


def generate(model, params, mode_kw, labels_np, quant_collections=None):
    from fitv2_tpu.sample import SamplingConfig, build_sampler
    mode_kw = dict(mode_kw)
    cfg_scale = mode_kw.pop('cfg_scale', CFG)
    gen_batch = min(BATCH, N_GEN)
    cfg = SamplingConfig(
        image_height=N_HW * 2 * 8, image_width=N_HW * 2 * 8,
        num_sampling_steps=SAMPLE_STEPS, cfg_scale=cfg_scale,
        num_classes=N_CLASSES, per_device_batch=gen_batch,
        dtype=jnp.bfloat16, **mode_kw)
    fn = build_sampler(model, params, cfg,
                       quant_collections=quant_collections)
    outs = []
    for bi in range(N_GEN // gen_batch):
        lab = jnp.asarray(labels_np[bi * gen_batch:(bi + 1) * gen_batch])
        out = fn(jax.random.fold_in(jax.random.PRNGKey(7), bi), lab)
        outs.append(from_latents(out))
    return np.concatenate(outs, 0)


# -- scoring -----------------------------------------------------------------

def mode_templates():
    """Noise-free rendering of each (class, mode) at jitter center."""
    labels = np.repeat(np.arange(N_CLASSES), N_MODES).astype(np.int32)
    modes = np.tile(np.arange(N_MODES), N_CLASSES).astype(np.int32)
    fg, bg, cy, cx = _palettes()
    n = len(labels)
    grad = (0.75 + 0.5 * _YY / IMG)[None, :, :, None]
    img = bg[labels][:, None, None, :] * grad
    r = 5.5
    dy = _YY[None] - cy[modes][:, None, None]
    dx = _XX[None] - cx[modes][:, None, None]
    disc = (modes % 2).astype(bool)
    inside = np.where(disc[:, None, None], dy ** 2 + dx ** 2 <= r * r,
                      (np.abs(dy) <= r) & (np.abs(dx) <= r))
    img = np.where(inside[..., None], fg[labels][:, None, None, :] * grad,
                   img)
    return (np.clip(img, 0, 1) * 2 - 1).astype(np.float32), labels, modes


def mode_stats(x, labels):
    tmpl, t_lab, t_mode = mode_templates()
    tf = tmpl.reshape(len(tmpl), -1)
    xf = x.reshape(len(x), -1)
    # nearest template by L2
    d = ((xf ** 2).sum(1)[:, None] - 2 * xf @ tf.T
         + (tf ** 2).sum(1)[None, :])
    nearest = d.argmin(1)
    cond_acc = float((t_lab[nearest] == labels).mean())
    hit = np.zeros(len(tmpl), bool)
    hit[np.unique(nearest)] = True
    coverage = int(hit.sum())
    counts = np.bincount(nearest, minlength=len(tmpl)).astype(np.float64)
    expect = len(x) / len(tmpl)
    chi2 = float(((counts - expect) ** 2 / expect).mean())
    return coverage, cond_acc, chi2


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else TRAIN_STEPS
    print('backend:', jax.devices(), flush=True)
    print(f'scenes: {N_CLASSES} classes x {N_MODES} modes, {IMG}x{IMG}x3, '
          f'N_GEN={N_GEN}', flush=True)

    from fitv2_tpu.eval.inception import compute_activations, load_inception
    from fitv2_tpu.eval import statistics as stats
    inc_model, inc_params = load_inception(None)

    def pool3(img):
        return compute_activations(inc_model, inc_params, to_uint8(img),
                                   batch_size=256)['pool3']

    def fd(a, b):
        mu_a, s_a = stats.activation_statistics(a)
        mu_b, s_b = stats.activation_statistics(b)
        return float(stats.frechet_distance(mu_a, s_a, mu_b, s_b))

    # the FD floor: two independent real draws
    real, real_lab, _ = draw_real(N_GEN, seed=11)
    real2, _, _ = draw_real(N_GEN, seed=13)
    t0 = time.time()
    real_p3 = pool3(real)
    floor = fd(real_p3, pool3(real2))
    cov_r, acc_r, chi_r = mode_stats(real2, draw_real(N_GEN, 13)[1])
    print(f'REAL vs REAL floor: FD {floor:.3f}  coverage {cov_r}/'
          f'{N_CLASSES * N_MODES}  cond_acc {acc_r:.3f}  chi2 {chi_r:.2f} '
          f'({time.time()-t0:.0f}s)', flush=True)

    model, ema = train(steps)

    gen_lab = np.random.default_rng(77).integers(
        N_CLASSES, size=N_GEN).astype(np.int32)

    # int8 calibration shared across quantized modes (bench.py idiom)
    from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                     prequantize_weights)
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    mq = build_model('int8')
    g2, m2, s2 = make_grid_mask_size(2 * min(BATCH, N_GEN), N_HW, N_HW,
                                     N_CTX)
    zc = jax.random.normal(jax.random.PRNGKey(9),
                           (2 * min(BATCH, N_GEN), N_CTX, TOKEN_DIM),
                           jnp.float32)
    yy = jnp.asarray(np.tile(gen_lab[:min(BATCH, N_GEN)], 2))
    cal_batches = [(zc * s, jnp.full((zc.shape[0],), t, jnp.float32), yy,
                    g2, None, s2) for s, t in ((1.0, 0.05), (0.8, 0.5),
                                               (0.7, 0.9))]
    coll = {'quant_calib': calibrate_quant_scales(mq, ema, cal_batches),
            'quant_weights': prequantize_weights(mq, ema, cal_batches[0])}

    modes_table = [
        ('dense_bf16', model, {}, None),
        ('int8cal', mq, {}, coll),
        ('int8_interval', mq, {'guidance_low': 0.3, 'guidance_high': 0.9},
         coll),
        ('int8_extrap2', mq, {'velocity_eval_every': 2,
                              'velocity_extrap_order': 2}, coll),
        ('composed_max', mq, {'guidance_low': 0.3, 'guidance_high': 0.9,
                              'velocity_eval_every': 2,
                              'velocity_extrap_order': 2}, coll),
    ]
    results = {'fd_floor': round(floor, 3)}
    dense_fd = None
    for name, m, kw, c in modes_table:
        t0 = time.time()
        try:
            x = generate(m, ema, kw, gen_lab, quant_collections=c)
        except Exception as e:  # recorded, never silent
            results[name] = {'error': f'{type(e).__name__}: {e}'[:200]}
            print(f'{name}: FAILED {results[name]["error"]}', flush=True)
            continue
        v = fd(real_p3, pool3(x))
        cov, acc, chi = mode_stats(x, gen_lab)
        if name == 'dense_bf16':
            dense_fd = v
        results[name] = {'fd': round(v, 3), 'coverage': cov,
                         'cond_acc': round(acc, 3), 'chi2': round(chi, 2),
                         'fd_delta_vs_dense': (round(v - dense_fd, 3)
                                               if dense_fd is not None
                                               else None)}
        print(f'{name:14s}: FD {v:7.3f} (floor {floor:.3f})  '
              f'coverage {cov}/{N_CLASSES * N_MODES}  cond_acc {acc:.3f}  '
              f'chi2 {chi:8.2f}  ({time.time()-t0:.0f}s)', flush=True)
    print('IMG_AB_JSON ' + json.dumps(results), flush=True)


if __name__ == '__main__':
    main()
