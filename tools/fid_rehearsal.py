"""FID-generation dress rehearsal at the headline config (round-5 VERDICT #2).

The headline bench times the denoise scan only; the reference's FID loop
(/root/reference/sample_fitv2_ddp.py:248-348) includes unpatchify + VAE
decode + device->host + npz. This tool runs the FULL pipeline on hardware
with random weights (quality is environment-blocked; plumbing and
throughput are not):

  headline  XL-256, 250-step CFG Euler, bf16, on-device VAE decode ->
            uint8 -> host -> resume-dir shard writes, through
            build_sampler + generate_fid_samples. Prints full-pipeline
            img/s next to the scan-only bench number and the decode/IO
            overhead fraction.
  scale     the 50K-image run: same XL model + VAE + npz + evaluate
            plumbing with a short ladder (steps=8 — the ladder length
            only scales the already-measured scan; 50K exercises the
            loop/shard/npz/eval path at headline SAMPLE scale). Mid-run
            SIGKILL + --resume-dir restart, assert zero batches lost or
            regenerated, save_npz (50K x 256x256x3), feed through
            cli/evaluate (in-tree Inception, self-referenced stats).
  resume    small bit-identity check: kill/resume vs uninterrupted run,
            byte-compare the npz files.

Run on the chip: python tools/fid_rehearsal.py headline|scale|resume
"""

import os as _os, sys as _sys
_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)
try:
    from fitv2_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(_REPO)
except Exception:
    pass

import json
import os
import shutil
import signal
import subprocess
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get('JAX_PLATFORMS') == 'cpu':
    jax.config.update('jax_platforms', 'cpu')

SCAN_ONLY_HEADLINE = 1.02  # BENCH_r04 bf16 img/s (denoise scan only)


def build_xl(steps, small=False):
    """XL sampler with on-device VAE decode, random weights."""
    from bench import build_model, init_params
    from fitv2_tpu.sample import SamplingConfig, build_sampler
    from fitv2_tpu.vae import AutoencoderKL
    if small:
        from fitv2_tpu.models.fit import FiT
        model = FiT(context_size=64, patch_size=2, in_channels=4,
                    hidden_size=64, depth=2, num_heads=4, num_classes=10,
                    learn_sigma=False, use_sit=True, use_swiglu=True,
                    adaln_type='lora', adaln_lora_dim=16, max_cached_len=8,
                    dtype=jnp.bfloat16)
        h = w = 128
    else:
        model = build_model()
        h = w = 256
    params = init_params(model)
    vae = AutoencoderKL(dtype=jnp.bfloat16)
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        lat = jnp.zeros((1, h // 8, w // 8, 4), jnp.float32)
        vae_params = jax.jit(vae.init, static_argnames='method')(
            jax.random.PRNGKey(0), lat, method=vae.decode)['params']
        vae_params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32
            else p, vae_params)
    dev = jax.devices()[0]
    if dev != cpu:
        vae_params = jax.device_put(vae_params, dev)
    cfg = SamplingConfig(image_height=h, image_width=w,
                         num_sampling_steps=steps, cfg_scale=1.5,
                         num_classes=model.num_classes,
                         per_device_batch=8, dtype=jnp.bfloat16)
    fn = build_sampler(model, params, cfg, vae, vae_params)
    return fn


def run_headline():
    from fitv2_tpu.sample.pipeline import generate_fid_samples
    tmp = tempfile.mkdtemp(prefix='fid_dress_')
    try:
        fn = build_xl(steps=250)
        # one warmup batch (compile)
        t0 = time.time()
        _ = generate_fid_samples(fn, 8, 8, seed=123)
        compile_s = time.time() - t0
        n = 96
        t0 = time.time()
        imgs = generate_fid_samples(fn, n, 8, seed=0,
                                    resume_dir=os.path.join(tmp, 'shards'))
        dt = time.time() - t0
        from fitv2_tpu.sample.pipeline import save_npz
        t1 = time.time()
        save_npz(os.path.join(tmp, 'samples.npz'), imgs, n)
        npz_s = time.time() - t1
        assert imgs.shape == (n, 256, 256, 3) and imgs.dtype == np.uint8
        rate = n / dt
        out = {'mode': 'headline_full_pipeline', 'images': n,
               'full_pipeline_img_per_s': round(rate, 4),
               'scan_only_img_per_s': SCAN_ONLY_HEADLINE,
               'pipeline_overhead_pct': round(
                   100 * (SCAN_ONLY_HEADLINE - rate) / SCAN_ONLY_HEADLINE,
                   2),
               'final_npz_write_s': round(npz_s, 2),
               'compile_s': round(compile_s, 1)}
        print(json.dumps(out), flush=True)
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# -- child entry for kill/resume tests ---------------------------------------

def _child(out_dir, n, steps, small):
    fn = build_xl(steps=steps, small=small)
    from fitv2_tpu.sample.pipeline import generate_fid_samples, save_npz
    imgs = generate_fid_samples(fn, n, 8, seed=0, progress=True,
                                num_classes=10 if small else 1000,
                                resume_dir=os.path.join(out_dir, 'shards'))
    save_npz(os.path.join(out_dir, 'samples.npz'), imgs, n)
    print('CHILD_DONE', flush=True)


def _spawn(out_dir, n, steps, small):
    here = os.path.join(_REPO, 'tools')
    code = (f'import sys; sys.path.insert(0, {_REPO!r}); '
            f'sys.path.insert(0, {here!r}); '
            f'from fid_rehearsal import _child; '
            f'_child({out_dir!r}, {n}, {steps}, {small})')
    env = dict(os.environ)
    return subprocess.Popen([_sys.executable, '-c', code], env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def _wait_for_shards(d, k, proc, timeout=3600):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if proc.poll() is not None:
            print(proc.stdout.read()[-3000:])
            raise RuntimeError('child exited early')
        done = len([f for f in os.listdir(d)
                    if f.endswith('.npy') and not f.endswith('.tmp.npy')]
                   ) if os.path.isdir(d) else 0
        if done >= k:
            return done
        time.sleep(2)
    raise TimeoutError(f'only {done} shards after {timeout}s')


def run_kill_resume(n, steps, small, label):
    """SIGKILL the generator mid-run; resume; assert zero loss/regen and
    (vs a separate uninterrupted run) bit-identical npz."""
    tmp = tempfile.mkdtemp(prefix='fid_resume_')
    try:
        shard_dir = os.path.join(tmp, 'a', 'shards')
        n_batches = n // 8
        kill_at = max(2, n_batches // 2)
        p = _spawn(os.path.join(tmp, 'a'), n, steps, small)
        _wait_for_shards(shard_dir, kill_at, p)
        p.kill()  # SIGKILL: no atexit, no cleanup — the hard preemption
        p.wait()
        done_before = {f: os.path.getmtime(os.path.join(shard_dir, f))
                       for f in os.listdir(shard_dir)
                       if f.endswith('.npy') and not f.endswith('.tmp.npy')}
        print(f'killed child with {len(done_before)}/{n_batches} shards',
              flush=True)
        t0 = time.time()
        p2 = _spawn(os.path.join(tmp, 'a'), n, steps, small)
        out2, _ = p2.communicate(timeout=3600)
        assert 'CHILD_DONE' in out2, out2[-3000:]
        resume_s = time.time() - t0
        # completed shards were reused, not regenerated
        regen = [f for f, m in done_before.items()
                 if abs(os.path.getmtime(os.path.join(shard_dir, f)) - m)
                 > 1e-6]
        assert not regen, f'resume regenerated completed shards: {regen}'
        # uninterrupted reference run -> bit-identical npz
        p3 = _spawn(os.path.join(tmp, 'b'), n, steps, small)
        out3, _ = p3.communicate(timeout=3600)
        assert 'CHILD_DONE' in out3, out3[-3000:]
        a = np.load(os.path.join(tmp, 'a', 'samples.npz'))['arr_0']
        b = np.load(os.path.join(tmp, 'b', 'samples.npz'))['arr_0']
        identical = bool((a == b).all() and a.shape == b.shape)
        out = {'mode': f'kill_resume_{label}', 'images': n,
               'killed_with_shards': len(done_before),
               'shards_regenerated': len(regen),
               'resume_wall_s': round(resume_s, 1),
               'npz_bit_identical_to_uninterrupted': identical}
        print(json.dumps(out), flush=True)
        assert identical
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_scale():
    """50K images through generate -> kill/resume -> npz -> evaluate."""
    tmp = tempfile.mkdtemp(prefix='fid_50k_', dir='/tmp')
    try:
        n, steps = 50_000, 8
        out_dir = os.path.join(tmp, 'run')
        shard_dir = os.path.join(out_dir, 'shards')
        n_batches = n // 8
        p = _spawn(out_dir, n, steps, False)
        _wait_for_shards(shard_dir, n_batches // 2, p)
        p.kill()
        p.wait()
        done_before = len(os.listdir(shard_dir))
        print(f'killed at ~50% ({done_before} shard files)', flush=True)
        t0 = time.time()
        p2 = _spawn(out_dir, n, steps, False)
        out2, _ = p2.communicate()
        assert 'CHILD_DONE' in out2, out2[-3000:]
        gen_s = time.time() - t0
        npz = os.path.join(out_dir, 'samples.npz')
        imgs_shape = None
        arr = np.load(npz, mmap_mode='r')['arr_0']
        imgs_shape = arr.shape
        assert imgs_shape == (n, 256, 256, 3), imgs_shape
        # evaluate: in-tree Inception (random weights), ref = the same
        # batch's own stats -> FID ~ 0 proves the metric plumbing at 50K
        from fitv2_tpu.eval import statistics as stats
        from fitv2_tpu.eval.evaluator import Evaluator
        t1 = time.time()
        ev = Evaluator(inception_weights=None, batch_size=64)
        acts = ev.read_activations(npz)
        mu, sigma = stats.activation_statistics(acts['pool3'])
        ref = os.path.join(tmp, 'ref_stats.npz')
        np.savez(ref, mu=mu, sigma=sigma)
        from fitv2_tpu.cli.evaluate import main as eval_main
        eval_main([ref, npz])
        eval_s = time.time() - t1
        out = {'mode': 'scale_50k', 'images': n, 'steps': steps,
               'resumed_from_shards': done_before,
               'generate_wall_s_after_resume': round(gen_s, 1),
               'npz_gb': round(os.path.getsize(npz) / 1e9, 2),
               'evaluate_wall_s': round(eval_s, 1)}
        print(json.dumps(out), flush=True)
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == '__main__':
    mode = _sys.argv[1] if len(_sys.argv) > 1 else 'resume'
    if mode == 'headline':
        run_headline()
    elif mode == 'scale':
        run_scale()
    elif mode == 'resume':
        run_kill_resume(n=32, steps=8, small=True, label='small')
    elif mode == 'resume_xl':
        run_kill_resume(n=96, steps=50, small=False, label='xl')
    else:
        raise SystemExit(f'unknown mode {mode}')
