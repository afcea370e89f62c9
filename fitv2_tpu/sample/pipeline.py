"""Bucketed FiTv2 sampling pipeline: noise -> denoise scan -> VAE -> uint8.

TPU-native rebuild of /root/reference/sample_fitv2_ddp.py:42-348. The whole
per-batch computation — CFG double-batch Euler loop (:297-314), unpatchify
(:319-320), VAE decode (:321-322) and uint8 quantization (:324-328) — is one
jitted program per (height, width) bucket; XLA keeps everything resident in
HBM across the 250 steps.

RoPE resolution extrapolation follows the reference CLI plumbing (:75-99):
an interpolation mode rewrites the model's frequency config for the target
bucket (max_pe_len = target patch grid, ori_max_pe_len = training grid).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from fitv2_tpu.models.grid_utils import make_grid_mask_size, pixels_to_tokens

Array = jax.Array

# CLI name -> custom_freqs (reference sample_fitv2_ddp.py:75-93).
# 'keep' is ours: leave the model's RoPE config untouched (the HR configs
# already carry online decoupled NTK — configs/fitv2_hr_xl.yaml — and
# resetting them to 'normal' would silently sample a different model).
INTERPOLATION_MODES = {
    'no': 'normal',
    'keep': None,
    'linear': 'linear',
    'dynntk': 'ntk-aware',
    'ntkpro1': 'ntk-aware-pro1',
    'ntkpro2': 'ntk-aware-pro2',
    'partntk': 'ntk-by-parts',
    'yarn': 'yarn',
}


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    image_height: int = 256
    image_width: int = 256
    num_sampling_steps: int = 250
    cfg_scale: float = 1.5
    num_classes: int = 1000
    per_device_batch: int = 8
    interpolation: str = 'no'        # key of INTERPOLATION_MODES
    decouple: bool = False
    ori_max_pe_len: Optional[int] = None
    vae_scale: float = 0.18215
    dtype: Any = jnp.bfloat16
    # shard the CFG batch over all local devices (v5e-8 style DP FID
    # generation — the reference's DDP loop, sample_fitv2_ddp.py:51, as a
    # sharding instead of processes); effective batch becomes
    # per_device_batch * local_device_count
    data_parallel: bool = False
    # training-free NFE reduction (flow/samplers.euler_sample_extrapolated):
    # run the model only on every N-th ladder step, linear-in-t velocity
    # extrapolation in between. 1 (default) = exact dense Euler (the parity
    # path); 2 halves the model cost. Opt-in speed mode, like int8.
    velocity_eval_every: int = 1
    # extrapolation order between evals: 1 = linear-in-t (default),
    # 2 = Newton quadratic through the last three eval velocities (same
    # model cost, tighter when the field curves — see euler_sample_
    # extrapolated)
    velocity_extrap_order: int = 1
    # guidance interval: apply CFG (double-batch) only on steps whose t_cur
    # lies in [guidance_low, guidance_high]; outside the window the model
    # runs a SINGLE conditional batch (half cost per step). Semantics match
    # the reference's LwD maruyama samplers
    # (/root/reference/fit/model/fit_model_lwd_bk.py:1332,1396:
    # `cfg > 1 and guidance_low <= t_cur <= guidance_high`), lifted to the
    # main FM Euler path. (0.0, 1.0) = full-interval CFG (the parity path).
    guidance_low: float = 0.0
    guidance_high: float = 1.0
    # 'ode' (flow-matching Euler, FiTv2) or 'ddpm'/'ddim' (FiTv1
    # improved-diffusion ancestral/DDIM loops — reference
    # sample_fit_ddp.py:173-175 runs diffusion.p_sample_loop over
    # forward_with_cfg with the whole 2B CFG batch; num_sampling_steps
    # becomes the timestep respacing).
    sampler_mode: str = 'ode'
    # kwargs for sched.gaussian_diffusion.create_diffusion when
    # sampler_mode != 'ode' (noise_schedule, diffusion_steps, learn_sigma,
    # ... — the reference's config_diffusion.improved_diffusion section,
    # sample_fit_ddp.py:104-105). timestep_respacing is always overridden
    # with str(num_sampling_steps).
    diffusion_config: Optional[Dict[str, Any]] = None


def apply_rope_interpolation(model, cfg: SamplingConfig):
    """Patch the model's RoPE config for the target bucket
    (reference sample_fitv2_ddp.py:75-99)."""
    n_h, n_w = pixels_to_tokens(cfg.image_height, cfg.image_width,
                                model.patch_size)
    mode = INTERPOLATION_MODES[cfg.interpolation]
    if cfg.interpolation == 'keep':
        return model
    if cfg.interpolation == 'no':
        return model.clone(custom_freqs='normal', online_rope=False)
    assert cfg.ori_max_pe_len is not None, (
        'interpolated sampling needs ori_max_pe_len (training grid size)')
    return model.clone(
        custom_freqs=mode, max_pe_len_h=n_h, max_pe_len_w=n_w,
        decouple=cfg.decouple, ori_max_pe_len=cfg.ori_max_pe_len,
        online_rope=False,
        max_cached_len=max(model.max_cached_len, n_h, n_w))


def build_sampler(model, params, cfg: SamplingConfig,
                  vae=None, vae_params=None,
                  return_trajectory: bool = False,
                  quant_collections: Optional[Dict[str, Any]] = None,
                  ) -> Callable[[Array, Array], Array]:
    """Returns jitted sample_fn(rng, labels(B,)) -> images.

    With a VAE: uint8 (B, H, W, 3). Without: latents (B, C, H/8, W/8).
    The bucket's shapes are static; call once per bucket and reuse.

    return_trajectory=True additionally returns the per-step noisy latents
    (steps, B, N, C) — the difficulty-analysis capture of
    reference sample_fitv2_ddp_difficulty.py:321-336.

    quant_collections: precomputed {'quant_calib', 'quant_weights'} for the
    int8 serving mode. When given, the pipeline uses exactly these instead
    of running its own built-in calibration pass, so the served model is the
    one whose fidelity was measured (bench.py passes its own so the composed
    serving-max config shares the int8_serving calibration).
    """
    model = apply_rope_interpolation(model, cfg)
    n_h, n_w = pixels_to_tokens(cfg.image_height, cfg.image_width,
                                model.patch_size)
    lat_h, lat_w = cfg.image_height // 8, cfg.image_width // 8
    n_ctx = model.context_size
    assert n_h * n_w <= n_ctx, (
        f'bucket {n_h}x{n_w} exceeds context {n_ctx}; build the model with a '
        f'larger context_size for this bucket')
    if cfg.velocity_eval_every > 1 and return_trajectory:
        raise ValueError(
            'velocity_eval_every > 1 is not supported with '
            'return_trajectory=True (the extrapolated sampler does not '
            'materialize per-step states); use velocity_eval_every=1 for '
            'trajectory dumps')
    use_interval = (cfg.guidance_low, cfg.guidance_high) != (0.0, 1.0)
    if use_interval and return_trajectory:
        raise ValueError(
            'guidance_low/high does not compose with return_trajectory; '
            'use the full-interval path for trajectory dumps')
    use_ddpm = cfg.sampler_mode != 'ode'
    if use_ddpm:
        # FiTv1 improved-diffusion sampling (reference sample_fit_ddp.py:
        # 173-175): diffusion.p_sample_loop / ddim over forward_with_cfg on
        # the whole 2B CFG batch; the model receives the RAW mapped integer
        # timesteps (respace.py _WrappedModel semantics — _model_t here).
        if cfg.sampler_mode not in ('ddpm', 'ddim'):
            raise ValueError(
                f"sampler_mode must be 'ode', 'ddpm' or 'ddim', got "
                f'{cfg.sampler_mode!r}')
        if cfg.velocity_eval_every > 1 or use_interval or return_trajectory:
            raise ValueError(
                'sampler_mode ddpm/ddim composes with none of '
                'velocity_eval_every / guidance_low/high / '
                'return_trajectory (flow-ladder features)')
        from fitv2_tpu.sched.gaussian_diffusion import create_diffusion
        dc = dict(cfg.diffusion_config or {})
        dc.pop('timestep_respacing', None)
        diffusion = create_diffusion(
            timestep_respacing=str(cfg.num_sampling_steps), **dc)
    elif model.learn_sigma:
        raise ValueError(
            "sampler_mode='ode' (flow-matching Euler) needs a velocity "
            'model (learn_sigma=False); a learned-sigma FiTv1 model must '
            "use sampler_mode='ddpm' or 'ddim'")
    n_dev = len(jax.local_devices()) if cfg.data_parallel else 1
    B = cfg.per_device_batch * n_dev
    token_dim = model.patch_size ** 2 * model.in_channels

    def _bucket_inputs(batch):
        """grid/mask/size at the given batch; on a full bucket the mask is
        dropped STATICALLY so the softmax `where` and both padded-output
        zeroings leave the graph (the reference sampler always builds
        mask=ones here, sample_fitv2_ddp.py:263-271 — identical results)."""
        g, m, s = make_grid_mask_size(batch, n_h, n_w, n_ctx)
        return g, (None if n_h * n_w == n_ctx else m), s

    grid, mask, size = _bucket_inputs(2 * B)
    y_null = jnp.full((B,), cfg.num_classes, jnp.int32)
    sigmas = jnp.linspace(0.0, 1.0, cfg.num_sampling_steps + 1)
    if use_interval:
        grid_c, mask_c, size_c = _bucket_inputs(B)
        sig_np = np.linspace(0.0, 1.0, cfg.num_sampling_steps + 1)
        pairs_np = np.stack([sig_np[:-1], sig_np[1:]], axis=-1)
        in_win = ((pairs_np[:, 0] >= cfg.guidance_low)
                  & (pairs_np[:, 0] <= cfg.guidance_high))
        idx = np.flatnonzero(in_win)
        i0 = int(idx[0]) if idx.size else 0
        i1 = int(idx[-1]) + 1 if idx.size else 0
        _pre, _win, _post = (pairs_np[:i0], pairs_np[i0:i1], pairs_np[i1:])

    # int8 serving mode: one-time weight prequantization + static activation
    # scales calibrated on noise-level trajectory states (ops/quant.py).
    # The collections ride as jit ARGUMENTS via the `variables` dict —
    # closing over the int8 kernels would embed ~0.5x the model size as HLO
    # constants (the remote-compile tunnel rejects such payloads).
    variables = {'params': params}
    if quant_collections is not None:
        variables.update(quant_collections)
    elif getattr(model, 'gemm_precision', 'bf16') == 'int8':
        from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                         prequantize_weights)
        crng = jax.random.PRNGKey(0)
        zc = jax.random.normal(crng, (2 * B, n_ctx, token_dim), jnp.float32)
        yc = jnp.concatenate([jnp.zeros((B,), jnp.int32), y_null])
        batches = [(zc * s, jnp.full((2 * B,), t, jnp.float32), yc, grid,
                    mask, size) for s, t in
                   ((1.0, 0.05), (0.9, 0.3), (0.8, 0.6), (0.7, 0.9))]
        variables['quant_calib'] = calibrate_quant_scales(
            model, params, batches)
        variables['quant_weights'] = prequantize_weights(
            model, params, batches[0])

    if use_ddpm and cfg.cfg_scale <= 1.0:
        grid_1, mask_1, size_1 = _bucket_inputs(B)

    def _decode(z):
        """Valid tokens -> unpatchify -> (optional) VAE -> uint8
        (reference sample_fitv2_ddp.py:319-328)."""
        z = z[:, :n_h * n_w]
        latents = model.unpatchify(z, (lat_h, lat_w), channel_last=True)
        latents = latents[..., :model.in_channels]  # drop sigma channels
        if vae is None:
            return jnp.transpose(latents, (0, 3, 1, 2))
        images = vae.apply({'params': vae_params},
                           latents.astype(cfg.dtype) / cfg.vae_scale,
                           method=vae.decode)
        images = jnp.clip(images.astype(jnp.float32), -1.0, 1.0)
        return jnp.clip(127.5 * images + 128.0, 0, 255).astype(jnp.uint8)

    def sample_fn(variables, rng: Array, labels: Array) -> Array:
        y = jnp.concatenate([labels.astype(jnp.int32), y_null])
        z = jax.random.normal(rng, (B, n_ctx, token_dim), jnp.float32)

        if use_ddpm:
            from fitv2_tpu.models.fit import forward_with_cfg
            k_loop = jax.random.fold_in(rng, 1)
            if cfg.cfg_scale > 1.0:
                # whole-loop 2B CFG batch; forward_with_cfg re-syncs the
                # halves each call (reference sample_fit_ddp.py:160-176)
                def model_fn(x, t):
                    return forward_with_cfg(
                        model, None, x.astype(cfg.dtype),
                        t.astype(jnp.float32), y, grid, mask, size,
                        cfg.cfg_scale, variables=variables
                    ).astype(jnp.float32)
                noise = jnp.concatenate([z, z], axis=0)
            else:
                def model_fn(x, t):
                    return model.apply(
                        variables, x.astype(cfg.dtype),
                        t.astype(jnp.float32), labels.astype(jnp.int32),
                        grid_1, mask_1, size_1).astype(jnp.float32)
                noise = z
            loop = (diffusion.p_sample_loop if cfg.sampler_mode == 'ddpm'
                    else diffusion.ddim_sample_loop)
            z = loop(k_loop, model_fn, noise.shape, noise=noise,
                     clip_denoised=False)
            z = z[:B]
            return _decode(z)

        def step(z, pair):
            t_cur, t_next = pair[0], pair[1]
            z_in = jnp.concatenate([z, z], axis=0).astype(cfg.dtype)
            t2 = jnp.full((2 * B,), t_cur, jnp.float32)
            out = model.apply(variables, z_in, t2, y, grid, mask,
                              size)
            cond, uncond = jnp.split(out.astype(jnp.float32), 2, axis=0)
            v = uncond + cfg.cfg_scale * (cond - uncond)
            z_next = z + (t_next - t_cur) * v
            return z_next, (z_next if return_trajectory else None)

        if cfg.velocity_eval_every > 1:
            from fitv2_tpu.flow.samplers import euler_sample_extrapolated

            def drift(zc, t_vec):
                z_in = jnp.concatenate([zc, zc], axis=0).astype(cfg.dtype)
                t2 = jnp.concatenate([t_vec, t_vec]).astype(jnp.float32)
                out = model.apply(variables, z_in, t2, y, grid, mask, size)
                c, u = jnp.split(out.astype(jnp.float32), 2, axis=0)
                return u + cfg.cfg_scale * (c - u)

            if use_interval:
                # composed mode: each guidance phase runs the extrapolated
                # sampler on its sub-ladder. Extrapolation state restarts at
                # phase boundaries (the drift semantics change there: the
                # cond-only velocity is not continuous with the CFG-mixed
                # one, so a cross-phase slope would extrapolate the wrong
                # field) at the cost of one model call per boundary.
                def drift_cond(zc, t_vec):
                    out = model.apply(variables, zc.astype(cfg.dtype),
                                      t_vec.astype(jnp.float32),
                                      labels.astype(jnp.int32), grid_c,
                                      mask_c, size_c)
                    return out.astype(jnp.float32)

                n_steps = cfg.num_sampling_steps
                for a, b, dr in ((0, i0, drift_cond), (i0, i1, drift),
                                 (i1, n_steps, drift_cond)):
                    if b > a:
                        z = euler_sample_extrapolated(
                            dr, z, sigmas[a:b + 1],
                            eval_every=cfg.velocity_eval_every,
                            order=cfg.velocity_extrap_order)
            else:
                z = euler_sample_extrapolated(
                    drift, z, sigmas, eval_every=cfg.velocity_eval_every,
                    order=cfg.velocity_extrap_order)
            traj = None
        elif use_interval:
            # Steps whose t_cur falls outside [guidance_low, guidance_high]
            # run a SINGLE conditional forward (reference
            # fit_model_lwd_bk.py:1332). The ladder is static, so the
            # window partition is host-side: three scans, the outer two at
            # batch B, the window at 2B — each phase its own compiled body.
            def cond_step(z, pair):
                t_cur, t_next = pair[0], pair[1]
                t1 = jnp.full((B,), t_cur, jnp.float32)
                out = model.apply(variables, z.astype(cfg.dtype), t1,
                                  labels.astype(jnp.int32), grid_c, mask_c,
                                  size_c)
                return z + (t_next - t_cur) * out.astype(jnp.float32), None

            for seg, fn in ((_pre, cond_step), (_win, step),
                            (_post, cond_step)):
                if seg.shape[0]:
                    z, _ = jax.lax.scan(
                        lambda zc, p, f=fn: (f(zc, p)[0], None), z,
                        jnp.asarray(seg))
            traj = None
        else:
            pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=-1)
            z, traj = jax.lax.scan(step, z, pairs)

        out = _decode(z)
        return (out, traj) if return_trajectory else out

    if n_dev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.asarray(jax.local_devices()[:n_dev]), ('data',))
        rep = NamedSharding(mesh, P())
        dp = NamedSharding(mesh, P('data'))
        traj_sh = NamedSharding(mesh, P(None, 'data'))  # (steps, B, ...)
        out_sh = (dp, traj_sh) if return_trajectory else dp
        jitted = jax.jit(sample_fn, in_shardings=(rep, rep, dp),
                         out_shardings=out_sh)
    else:
        jitted = jax.jit(sample_fn)

    fn = lambda rng, labels: jitted(variables, rng, labels)  # noqa: E731
    fn.batch_size = B  # effective per-call batch (for FID loop sizing)
    # stable fingerprint of everything that changes the sampled
    # distribution — generate_fid_samples stamps it into the resume-dir
    # manifest so stale shards from a different config are refused
    import hashlib
    fp_src = (f'{cfg!r}|model={type(model).__name__}|nh={n_h}|nw={n_w}'
              f'|vae={vae is not None}|quant={quant_collections is not None}'
              f'|int8={getattr(model, "gemm_precision", "bf16")}')
    fn.config_fingerprint = hashlib.sha1(fp_src.encode()).hexdigest()[:16]
    return fn


def generate_fid_samples(sample_fn: Callable, num_fid_samples: int,
                         per_device_batch: int, num_classes: int = 1000,
                         seed: int = 0,
                         progress: bool = False,
                         resume_dir: Optional[str] = None) -> np.ndarray:
    """Per-process FID generation loop (reference :248-348 without DDP).

    Per-batch label/noise keys are folded from (seed, process_index, batch),
    the JAX analogue of the reference's rank-offset seeding (:54-56).
    Multi-host: each process generates its share; gather with
    fitv2_tpu.parallel.process_allgather before writing the npz.

    resume_dir: make the loop PREEMPTION-SAFE (beyond reference — the
    reference's 50K DDP run restarts from zero, sample_fitv2_ddp.py:248).
    Each completed batch is written to ``resume_dir`` atomically
    (tmp+rename); on restart, batches whose shard exists are loaded
    instead of re-sampled. Keys derive from (seed, proc, batch) only, so
    a resumed run is bit-identical to an uninterrupted one. A manifest
    (seed, batch size, sample count, classes, sampler-config fingerprint)
    is stamped into the dir; a rerun whose config differs is REFUSED
    instead of silently loading stale shards from the previous run.
    """
    proc = jax.process_index()
    n_proc = jax.process_count()
    per_proc = int(np.ceil(num_fid_samples / n_proc))
    out = []
    n_batches = int(np.ceil(per_proc / per_device_batch))
    it = range(n_batches)
    if progress and proc == 0:
        try:
            from tqdm import tqdm
            it = tqdm(it)
        except ImportError:
            pass
    if resume_dir:
        os.makedirs(resume_dir, exist_ok=True)
        import json
        manifest = {
            'seed': int(seed), 'per_device_batch': int(per_device_batch),
            'num_fid_samples': int(num_fid_samples),
            'num_classes': int(num_classes),
            'config_fingerprint': getattr(sample_fn, 'config_fingerprint',
                                          None)}
        mpath = os.path.join(resume_dir, 'manifest.json')
        if os.path.exists(mpath):
            with open(mpath) as f:
                prev = json.load(f)
            if prev != manifest:
                diff = {k: (prev.get(k), manifest[k]) for k in manifest
                        if prev.get(k) != manifest[k]}
                raise ValueError(
                    f'resume_dir {resume_dir} holds shards from a different '
                    f'run (manifest mismatch, existing vs requested: {diff});'
                    f' point --resume-dir at a fresh directory or delete it')
        elif proc == 0:
            tmp = mpath + '.tmp'
            with open(tmp, 'w') as f:
                json.dump(manifest, f)
            os.replace(tmp, mpath)

    def shard_path(bi):
        return os.path.join(resume_dir, f'shard_p{proc}_b{bi}.npy')

    base = jax.random.PRNGKey(seed)
    for bi in it:
        if resume_dir and os.path.exists(shard_path(bi)):
            try:
                arr = np.load(shard_path(bi))
                if len(arr) == per_device_batch:
                    out.append(arr)
                    continue
            except Exception:
                pass  # unreadable/partial shard: regenerate it
        key = jax.random.fold_in(jax.random.fold_in(base, proc), bi)
        k_label, k_noise = jax.random.split(key)
        labels = jax.random.randint(k_label, (per_device_batch,), 0,
                                    num_classes)
        imgs = np.asarray(sample_fn(k_noise, labels))
        if resume_dir:
            tmp = shard_path(bi) + '.tmp.npy'
            np.save(tmp, imgs)
            os.replace(tmp, shard_path(bi))
        out.append(imgs)
    return np.concatenate(out, axis=0)[:per_proc]


def save_npz(path: str, images: np.ndarray,
             num_fid_samples: Optional[int] = None) -> None:
    """ADM-evaluation-suite-compatible npz (reference :340-348)."""
    if num_fid_samples is not None:
        images = images[:num_fid_samples]
    np.savez(path, arr_0=images)
