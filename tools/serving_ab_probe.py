"""Distribution-level serving-mode A/B on a toy multimodal distribution
(round-4 VERDICT #6).

Round-3's serving-mode fidelity evidence was a single overfit anchor —
distribution-POINT evidence that cannot reveal mode-level damage (e.g.
interval guidance collapsing minor modes of a multimodal conditional).
This probe builds the missing distribution-level evidence entirely
in-sandbox:

  1. Synthetic conditional data: C classes x M modes per class in latent
     token space (8x8 grid, 16-dim tokens); a sample is
     mode_center + 0.1 * noise. Multimodal per class BY CONSTRUCTION.
  2. Train a small FiTv2 by flow matching (with class dropout, so CFG is
     meaningful) to convergence on-chip.
  3. Generate ~2K samples per serving mode through the REAL pipeline
     (sample/pipeline.build_sampler): dense bf16 (the FID-parity
     reference), int8cal, int8+interval[.3,.9], int8+extrap2(order 2),
     and the composed serving-max config.
  4. Compare against a fresh draw from the true distribution with
     feature-Frechet distances (raw latents + a fixed random-MLP embedding
     — a valid discriminative embedding for Frechet statistics even
     untrained, VERDICT r3) and mode-level statistics: mode coverage
     (#modes hit by nearest-center assignment), conditional accuracy
     (nearest center belongs to the conditioning class), and the chi^2 of
     the mode-usage histogram.

Prints a table of deltas vs the dense path + one JSON line.
Run (TPU): python tools/serving_ab_probe.py [train_steps]
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


N_CLASSES = _env('SAB_CLASSES', 8)
N_MODES = _env('SAB_MODES', 4)           # per class
N_HW = _env('SAB_NHW', 8)                # token grid side
N_CTX = N_HW * N_HW
TOKEN_DIM = 16
NOISE = _env('SAB_NOISE', 0.1, float)
BATCH = _env('SAB_BATCH', 256)
GEN_BATCH = BATCH
N_GEN = _env('SAB_NGEN', 2048)
SAMPLE_STEPS = _env('SAB_STEPS', 100)
CFG = _env('SAB_CFG', 1.5, float)
# 'fm' (FiTv2 flow-matching through sample/pipeline — the default) or
# 'lwd' (FiTLwD segment flows: reflow training via train/lwd_train_step,
# per-segment samplers, int8 + Maruyama-window serving modes)
FAMILY = _os.environ.get('SAB_FAMILY', 'fm')
K_LWD = _env('SAB_K', 3)      # perflow segments
S_LWD = _env('SAB_S', 8)      # Euler sub-steps per segment

# the generation loops emit exact multiples of GEN_BATCH; a silent tail
# drop would crash the scoring reshape AFTER the expensive training phase
assert N_GEN % GEN_BATCH == 0, (
    f'SAB_NGEN ({N_GEN}) must be a multiple of SAB_BATCH ({GEN_BATCH})')


def mode_centers(seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(
        (N_CLASSES, N_MODES, N_CTX, TOKEN_DIM)).astype(np.float32)


def draw_real(centers, n, seed=1):
    rng = np.random.default_rng(seed)
    y = rng.integers(N_CLASSES, size=n)
    m = rng.integers(N_MODES, size=n)
    x = centers[y, m] + NOISE * rng.standard_normal(
        (n, N_CTX, TOKEN_DIM)).astype(np.float32)
    return x.astype(np.float32), y.astype(np.int32)


def build_model(precision='bf16'):
    from fitv2_tpu.models.fit import FiT
    return FiT(context_size=N_CTX, patch_size=2, in_channels=4,
               hidden_size=256, depth=6, num_heads=4, num_classes=N_CLASSES,
               class_dropout_prob=0.1, learn_sigma=False, use_sit=True,
               use_swiglu=True, q_norm='layernorm', k_norm='layernorm',
               adaln_type='lora', adaln_lora_dim=64, max_cached_len=16,
               dtype=jnp.bfloat16, gemm_precision=precision)


def train(centers, steps, snr_type=None):
    """Trains with the production lognorm t-sampling by default
    (SAB_SNR=uniform to override)."""
    snr_type = snr_type or _os.environ.get('SAB_SNR', 'lognorm')
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
    # Params stay fp32 (model dtype=bf16 casts for compute). A bf16 cast
    # here silently breaks EMA: (1-0.999)*(p-ema) underflows bf16's ~2^-8
    # relative precision, so ema_params never leaves init — the sampler
    # then runs on random weights while the train loss looks converged.
    transport = create_transport('Linear', 'velocity', snr_type=snr_type)
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3))
    state = create_train_state(params, tx)
    step_fn = jax.jit(make_train_step(model, transport, tx, ema_decay=0.999),
                      donate_argnums=0)
    rng = jax.random.PRNGKey(5)
    t0 = time.time()
    for i in range(steps):
        x, y = draw_real(centers, BATCH, seed=1000 + i)
        batch = {'feature': jnp.asarray(x), 'grid': grid, 'mask': mask,
                 'label': jnp.asarray(y), 'size': size}
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
    cfg = SamplingConfig(
        image_height=N_HW * 2 * 8, image_width=N_HW * 2 * 8,  # 8x8 tokens
        num_sampling_steps=SAMPLE_STEPS, cfg_scale=cfg_scale,
        num_classes=N_CLASSES, per_device_batch=GEN_BATCH,
        dtype=jnp.bfloat16, **mode_kw)
    fn = build_sampler(model, params, cfg,
                       quant_collections=quant_collections)
    outs = []
    for bi in range(N_GEN // GEN_BATCH):
        lab = jnp.asarray(labels_np[bi * GEN_BATCH:(bi + 1) * GEN_BATCH])
        out = fn(jax.random.fold_in(jax.random.PRNGKey(7), bi), lab)
        # latents come back (B, C, H/8, W/8) == (B, 4, 16, 16); invert
        # model.unpatchify exactly (fit.py: token dim is (c, p, q)-ordered)
        # back to tokens (B, 64, 16) for comparison with the data space
        arr = np.asarray(out, np.float32).transpose(0, 2, 3, 1)  # B,16,16,4
        b = arr.shape[0]
        arr = arr.reshape(b, N_HW, 2, N_HW, 2, 4)        # b,gh,p,gw,q,c
        arr = arr.transpose(0, 1, 3, 5, 2, 4)            # b,gh,gw,c,p,q
        outs.append(arr.reshape(b, N_CTX, TOKEN_DIM))
    return np.concatenate(outs, 0)


def build_lwd(precision='bf16'):
    from fitv2_tpu.models.fit_lwd import FiTLwD
    return FiTLwD(context_size=N_CTX, patch_size=2, in_channels=4,
                  hidden_size=256, depth=6, num_heads=4,
                  num_classes=N_CLASSES, class_dropout_prob=0.1,
                  number_of_perflow=K_LWD, n_patch_h=N_HW, n_patch_w=N_HW,
                  adaln_type='lora', adaln_lora_dim=64, max_cached_len=16,
                  dtype=jnp.bfloat16, gemm_precision=precision)


def train_lwd(centers, steps):
    """Reflow segment training (train/lwd_train_step.py) on the toy
    distribution — the LwD production loop, one random segment per step."""
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    from fitv2_tpu.train import (OptimizerConfig, create_train_state,
                                 make_optimizer)
    from fitv2_tpu.train.lwd_train_step import (SegmentSampler,
                                                make_lwd_train_step)
    model = build_lwd()
    grid, mask, size = make_grid_mask_size(BATCH, N_HW, N_HW, N_CTX)
    params = model.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        jnp.zeros((1, N_CTX, TOKEN_DIM)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32), grid[:1], mask[:1], size[:1])['params']
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3))
    state = create_train_state(params, tx)
    step_fn = jax.jit(make_lwd_train_step(model, tx, ema_decay=0.999),
                      static_argnums=3, donate_argnums=0)
    seg = SegmentSampler(K_LWD, seed=0)
    rng = jax.random.PRNGKey(5)
    t0 = time.time()
    for i in range(steps):
        x, y = draw_real(centers, BATCH, seed=1000 + i)
        batch = {'feature': jnp.asarray(x), 'grid': grid, 'mask': mask,
                 'label': jnp.asarray(y), 'size': size}
        rng, sub = jax.random.split(rng)
        state, m = step_fn(state, batch, sub, seg())
        if i % 500 == 0 or i == steps - 1:
            print(f'train {i}: loss {float(m["loss"]):.4f} '
                  f'({time.time()-t0:.0f}s)', flush=True)
    return build_lwd(), state.ema_params


def generate_lwd(model, params, mode, labels_np, coll=None):
    """Per-segment samplers; LwD works in token space directly."""
    variables = {'params': params, **(coll or {})}

    if mode == 'plain':
        fn = jax.jit(lambda r, z, y: model.apply(
            variables, z, y, S_LWD, method=model.sample))
    elif mode == 'cfg':
        fn = jax.jit(lambda r, z, y: model.apply(
            variables, z, y, CFG, S_LWD, method=model.sample_cfg))
    elif mode == 'maruyama_win':
        fn = jax.jit(lambda r, z, y: model.apply(
            variables, r, z, y, CFG, S_LWD,
            guidance_low=0.3, guidance_high=0.9,
            method=model.sample_maruyama_cfg))
    else:
        raise ValueError(mode)
    outs = []
    for bi in range(N_GEN // GEN_BATCH):
        lab = jnp.asarray(labels_np[bi * GEN_BATCH:(bi + 1) * GEN_BATCH])
        z = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(7), bi),
                              (GEN_BATCH, N_CTX, TOKEN_DIM))
        # per-batch SDE key: a constant key would correlate the Maruyama
        # noise sequences across generation batches
        outs.append(np.asarray(
            fn(jax.random.fold_in(jax.random.PRNGKey(13), bi), z, lab),
            np.float32))
    return np.concatenate(outs, 0)


def random_mlp_features(x, dim=256, seed=123):
    """Fixed random 2-layer tanh MLP — a frozen discriminative embedding
    for Frechet statistics (VERDICT r3 #6's suggestion, minus the
    image-resize detour: the data lives in token space)."""
    rng = np.random.default_rng(seed)
    d_in = x.shape[1] * x.shape[2]
    w1 = rng.standard_normal((d_in, 512)).astype(np.float32) / np.sqrt(d_in)
    w2 = rng.standard_normal((512, dim)).astype(np.float32) / np.sqrt(512)
    h = np.tanh(x.reshape(len(x), -1) @ w1)
    return h @ w2


def mode_stats(x, labels, centers):
    """Nearest-center assignment -> coverage / conditional accuracy / chi2
    / mean nearest-center distance (vs the in-mode noise radius ~3.2)."""
    flat_c = centers.reshape(N_CLASSES * N_MODES, -1)
    d = (np.sum(x.reshape(len(x), -1) ** 2, 1, keepdims=True)
         - 2 * x.reshape(len(x), -1) @ flat_c.T
         + np.sum(flat_c ** 2, 1)[None])
    assign = d.argmin(1)
    cls = assign // N_MODES
    coverage = len(np.unique(assign)) / (N_CLASSES * N_MODES)
    cond_acc = float((cls == labels).mean())
    hist = np.bincount(assign, minlength=N_CLASSES * N_MODES)
    expect = len(x) / (N_CLASSES * N_MODES)
    chi2 = float(((hist - expect) ** 2 / expect).sum())
    ncd = float(np.sqrt(np.maximum(d.min(1), 0.0)).mean())
    return coverage, cond_acc, chi2, ncd


def _score(name, x, real, labels, centers, t0):
    from fitv2_tpu.eval.statistics import fid_from_activations
    n = len(x)
    raw_fd = fid_from_activations(real.reshape(n, -1), x.reshape(n, -1))
    mlp_fd = fid_from_activations(random_mlp_features(real),
                                  random_mlp_features(x))
    cov, acc, chi2, ncd = mode_stats(x, labels, centers)
    print(f'{name:14s}: raw-FD {raw_fd:8.4f}  mlp-FD {mlp_fd:8.4f}  '
          f'coverage {cov:.3f}  cond-acc {acc:.3f}  chi2 {chi2:8.1f}  '
          f'ncd {ncd:6.2f}  ({time.time()-t0:.0f}s)', flush=True)
    return dict(raw_fd=round(float(raw_fd), 4),
                mlp_fd=round(float(mlp_fd), 4), coverage=round(cov, 4),
                cond_acc=round(acc, 4), chi2=round(chi2, 1),
                nearest_center_dist=round(ncd, 2))


def main_lwd(steps):
    """LwD-family serving A/B: reflow-trained segment flows, sampled via
    the per-segment CFG/plain/Maruyama-window paths, dense bf16 vs int8."""
    centers = mode_centers()
    model, ema = train_lwd(centers, steps)

    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                     prequantize_weights)
    mq = build_lwd('int8')
    grid, mask, size = make_grid_mask_size(2 * GEN_BATCH, N_HW, N_HW, N_CTX)
    xc, yc_np = draw_real(centers, 2 * GEN_BATCH, seed=4242)
    cal = [(jnp.asarray(xc) * s, jnp.full((2 * GEN_BATCH,), t, jnp.float32),
            jnp.asarray(yc_np), grid, mask, size)
           for s, t in ((1.0, 0.1), (0.8, 0.5), (0.7, 0.9))]
    rngs = {'label_dropout': jax.random.PRNGKey(21)}
    coll = {'quant_calib': calibrate_quant_scales(mq, ema, cal, rngs=rngs),
            'quant_weights': prequantize_weights(mq, ema, cal[0],
                                                 rngs=rngs)}
    print('int8 calibrated', flush=True)

    rngl = np.random.default_rng(77)
    labels = rngl.integers(N_CLASSES, size=N_GEN).astype(np.int32)
    real, _ = draw_real(centers, N_GEN, seed=999)

    results = {}
    for name, m, mode, qc in (
            ('dense_cfg', model, 'cfg', None),
            ('dense_plain', model, 'plain', None),
            ('int8_cfg', mq, 'cfg', coll),
            ('int8_maru_win', mq, 'maruyama_win', coll)):
        t0 = time.time()
        x = generate_lwd(m, ema, mode, labels, coll=qc)
        results[name] = _score(name, x, real, labels, centers, t0)
    real2, y2 = draw_real(centers, N_GEN, seed=555)
    results['real_floor'] = _score('real-vs-real', real2, real, y2,
                                   centers, time.time())
    print(json.dumps({'metric': 'LwD serving-mode distribution A/B',
                      'train_steps': steps, 'n_gen': N_GEN,
                      'K': K_LWD, 'S': S_LWD, **results}), flush=True)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    print('backend:', jax.devices(), flush=True)
    if FAMILY == 'lwd':
        main_lwd(steps)
        return
    centers = mode_centers()
    model, ema = train(centers, steps)

    from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                     prequantize_weights)
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    mq = build_model('int8')
    b2 = 2 * GEN_BATCH
    grid, mask, size = make_grid_mask_size(b2, N_HW, N_HW, N_CTX)
    zc = jax.random.normal(jax.random.PRNGKey(9), (b2, N_CTX, TOKEN_DIM))
    yc = jnp.concatenate([
        (jnp.arange(GEN_BATCH) % N_CLASSES).astype(jnp.int32),
        jnp.full((GEN_BATCH,), N_CLASSES, jnp.int32)])
    cal = [(zc * s, jnp.full((b2,), t, jnp.float32), yc, grid, None, size)
           for s, t in ((1.0, 0.05), (0.8, 0.5), (0.7, 0.9))]
    coll = {'quant_calib': calibrate_quant_scales(mq, ema, cal),
            'quant_weights': prequantize_weights(mq, ema, cal[0])}
    print('int8 calibrated', flush=True)

    rngl = np.random.default_rng(77)
    labels = rngl.integers(N_CLASSES, size=N_GEN).astype(np.int32)
    real, real_y = draw_real(centers, N_GEN, seed=999)

    modes = [
        ('dense_bf16', model, {}, None),
        ('bf16_nocfg', model, {'cfg_scale': 1.0}, None),
        ('int8', mq, {}, coll),
        ('int8_interval', mq, {'guidance_low': 0.3, 'guidance_high': 0.9},
         coll),
        ('int8_extrap2', mq, {'velocity_eval_every': 2,
                              'velocity_extrap_order': 2}, coll),
        ('composed', mq, {'guidance_low': 0.3, 'guidance_high': 0.9,
                          'velocity_eval_every': 2,
                          'velocity_extrap_order': 2}, coll),
    ]

    results = {}
    for name, m, kw, qc in modes:
        t0 = time.time()
        x = generate(m, ema, kw, labels, quant_collections=qc)
        results[name] = _score(name, x, real, labels, centers, t0)
    # real-vs-real floor (sampling noise of the metric itself)
    real2, y2 = draw_real(centers, N_GEN, seed=555)
    results['real_floor'] = _score('real-vs-real', real2, real, y2,
                                   centers, time.time())
    print(json.dumps({'metric': 'serving-mode distribution A/B',
                      'train_steps': steps, 'n_gen': N_GEN, **results}),
          flush=True)


if __name__ == '__main__':
    main()
