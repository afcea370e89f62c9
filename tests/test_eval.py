"""Evaluation: FID math exactness, IS, precision/recall, inception shapes."""

import numpy as np
import pytest

from fitv2_tpu.eval import (
    fid_from_activations, frechet_distance, inception_score,
    precision_recall,
)
from fitv2_tpu.eval.measure import measure_all, mutual_information, ssim
from fitv2_tpu.eval.statistics import activation_statistics


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    acts = rng.standard_normal((500, 16))
    mu, sigma = activation_statistics(acts)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_frechet_distance_mean_shift_closed_form():
    """Same covariance, shifted mean: FID = |mu1-mu2|^2."""
    d = 8
    mu1 = np.zeros(d)
    mu2 = np.full(d, 0.5)
    sigma = np.eye(d)
    fid = frechet_distance(mu1, sigma, mu2, sigma)
    np.testing.assert_allclose(fid, d * 0.25, rtol=1e-8)


def test_frechet_distance_diagonal_closed_form():
    """Diagonal covariances: FID = |dmu|^2 + sum (sqrt(s1)-sqrt(s2))^2."""
    s1 = np.diag([1.0, 4.0])
    s2 = np.diag([9.0, 1.0])
    fid = frechet_distance(np.zeros(2), s1, np.zeros(2), s2)
    expect = (1 - 3) ** 2 + (2 - 1) ** 2
    np.testing.assert_allclose(fid, expect, rtol=1e-8)


def test_fid_from_samples_converges():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((4000, 8))
    b = rng.standard_normal((4000, 8))
    assert fid_from_activations(a, b) < 0.1
    c = rng.standard_normal((4000, 8)) + 2.0
    assert fid_from_activations(a, c) > 8.0


def test_inception_score_uniform_vs_confident():
    n, k = 1000, 10
    uniform = np.full((n, k), 1.0 / k)
    np.testing.assert_allclose(inception_score(uniform), 1.0, rtol=1e-5)
    confident = np.eye(k)[np.arange(n) % k] * 0.999 + 0.0001
    confident /= confident.sum(1, keepdims=True)
    assert inception_score(confident) > 5.0


def test_precision_recall_same_distribution():
    rng = np.random.default_rng(2)
    ref = rng.standard_normal((400, 4))
    samp = rng.standard_normal((400, 4))
    p, r = precision_recall(ref, samp)
    assert p > 0.8 and r > 0.8
    # disjoint distributions -> both near zero
    p2, r2 = precision_recall(ref, samp + 100.0)
    assert p2 < 0.05 and r2 < 0.05


def test_inception_forward_shapes():
    jax = pytest.importorskip('jax')
    import jax.numpy as jnp
    from fitv2_tpu.eval.inception import InceptionV3, preprocess_uint8
    model = InceptionV3()
    x = jnp.zeros((2, 299, 299, 3))
    params = model.init(jax.random.PRNGKey(0), x)['params']
    out = model.apply({'params': params}, x)
    assert out['pool3'].shape == (2, 2048)
    assert out['spatial'].shape == (2, 7 * 17 * 17)
    assert out['logits'].shape == (2, 1008)
    pre = preprocess_uint8(jnp.zeros((2, 64, 64, 3), jnp.uint8))
    assert pre.shape == (2, 299, 299, 3)
    assert float(pre.min()) == -1.0


def test_inception_importer_covers_init_tree():
    """Synthetic torch-style state dict must map 1:1 onto the flax tree."""
    jax = pytest.importorskip('jax')
    import jax.numpy as jnp
    from fitv2_tpu.eval.inception import (
        InceptionV3, convert_inception_state_dict)
    model = InceptionV3()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 299, 299, 3)))['params']
    flat = {jax.tree_util.keystr(p): v for p, v in
            jax.tree_util.tree_leaves_with_path(params)}
    # build torch sd with shapes derived from the flax tree
    sd = {}
    for path, v in flat.items():
        parts = [p for p in path.replace("['", '.').replace("']", '')
                 .split('.') if p]
        if parts[-1] == 'kernel' and parts[-2] == 'conv':
            tname = '.'.join(parts[:-2])
            kh, kw, ci, co = v.shape
            sd[f'{tname}.conv.weight'] = np.zeros((co, ci, kh, kw), np.float32)
            for bn_k, bn_v in (('weight', np.ones(co)), ('bias', np.zeros(co)),
                               ('running_mean', np.zeros(co)),
                               ('running_var', np.ones(co))):
                sd[f'{tname}.bn.{bn_k}'] = bn_v.astype(np.float32)
        elif parts[-1] == 'kernel':  # fc
            sd['fc.weight'] = np.zeros((v.shape[1], v.shape[0]), np.float32)
            sd['fc.bias'] = np.zeros(v.shape[1], np.float32)
    converted = convert_inception_state_dict(sd)
    conv_flat = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_leaves_with_path(converted)}
    init_flat = {k: v.shape for k, v in flat.items()}
    assert conv_flat == init_flat


def test_measure_stats():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    out = measure_all(img, img)
    assert 0 <= out['hf_ratio'] <= 1
    assert out['spectral_entropy'] > 0
    np.testing.assert_allclose(out['ssim'], 1.0, rtol=1e-6)
    assert out['mutual_information'] > 0
    # smooth image has lower hf energy than noise
    smooth = np.tile(np.linspace(0, 255, 32)[:, None, None],
                     (1, 32, 3)).astype(np.uint8)
    assert (measure_all(smooth)['hf_ratio'] < out['hf_ratio'])
