"""InceptionV3 feature extractor in flax for TF-free FID on TPU.

Replaces the reference's TensorFlow-v1 Inception graph
(/root/reference/fit/utils/evaluator.py:15-180) with a flax port of the
FID-standard InceptionV3 (torchvision layout with the pytorch-fid pooling
patches). NOTE: pytorch-fid features are close to but not bit-identical to
the TF-v1 pool_3 graph, so FID/sFID computed here carry a small systematic
offset vs reference-published ADM-suite numbers (typically <0.1 FID at 50K
samples in pytorch-fid's own comparisons); comparisons within this
framework are self-consistent:

  - pool3 features: (N, 2048) global-avg-pool activations -> FID
  - spatial features: first 7 channels of Mixed_6e's input (mixed_6/conv),
    flattened -> sFID (ADM evaluator convention)
  - softmax logits -> Inception Score

Weights are imported from a torchvision/pytorch-fid checkpoint via
``convert_inception_state_dict`` (zero-egress environments pass a local
file). BatchNorm is folded at import time (inference-only extractor), so the
flax module uses plain conv + bias.

Preprocessing parity: uint8 HWC -> bilinear resize to 299 (antialias off,
torch convention) -> scale to [-1, 1].
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class ConvBN(nn.Module):
    """Conv + (folded) bias + ReLU. BN is folded into kernel/bias on import;
    at init time bias starts at zero like a fresh BN."""
    features: int
    kernel: Tuple[int, int]
    strides: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=True, name='conv')(x)
        return nn.relu(x)


def _avg_pool_cip_false(x: Array, window: int = 3) -> Array:
    """3x3 stride-1 avg pool, count_include_pad=False (pytorch-fid patch)."""
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    summed = nn.pooling.avg_pool(x, (window, window), (1, 1), 'SAME')
    counts = nn.pooling.avg_pool(ones, (window, window), (1, 1), 'SAME')
    return summed / counts


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name='branch1x1')(x)
        b5 = ConvBN(48, (1, 1), name='branch5x5_1')(x)
        b5 = ConvBN(64, (5, 5), padding=2, name='branch5x5_2')(b5)
        b3 = ConvBN(64, (1, 1), name='branch3x3dbl_1')(x)
        b3 = ConvBN(96, (3, 3), padding=1, name='branch3x3dbl_2')(b3)
        b3 = ConvBN(96, (3, 3), padding=1, name='branch3x3dbl_3')(b3)
        bp = _avg_pool_cip_false(x)
        bp = ConvBN(self.pool_features, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=2, name='branch3x3')(x)
        bd = ConvBN(64, (1, 1), name='branch3x3dbl_1')(x)
        bd = ConvBN(96, (3, 3), padding=1, name='branch3x3dbl_2')(bd)
        bd = ConvBN(96, (3, 3), strides=2, name='branch3x3dbl_3')(bd)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), name='branch1x1')(x)
        b7 = ConvBN(c7, (1, 1), name='branch7x7_1')(x)
        b7 = ConvBN(c7, (1, 7), padding=[(0, 0), (3, 3)],
                    name='branch7x7_2')(b7)
        b7 = ConvBN(192, (7, 1), padding=[(3, 3), (0, 0)],
                    name='branch7x7_3')(b7)
        bd = ConvBN(c7, (1, 1), name='branch7x7dbl_1')(x)
        bd = ConvBN(c7, (7, 1), padding=[(3, 3), (0, 0)],
                    name='branch7x7dbl_2')(bd)
        bd = ConvBN(c7, (1, 7), padding=[(0, 0), (3, 3)],
                    name='branch7x7dbl_3')(bd)
        bd = ConvBN(c7, (7, 1), padding=[(3, 3), (0, 0)],
                    name='branch7x7dbl_4')(bd)
        bd = ConvBN(192, (1, 7), padding=[(0, 0), (3, 3)],
                    name='branch7x7dbl_5')(bd)
        bp = _avg_pool_cip_false(x)
        bp = ConvBN(192, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name='branch3x3_1')(x)
        b3 = ConvBN(320, (3, 3), strides=2, name='branch3x3_2')(b3)
        b7 = ConvBN(192, (1, 1), name='branch7x7x3_1')(x)
        b7 = ConvBN(192, (1, 7), padding=[(0, 0), (3, 3)],
                    name='branch7x7x3_2')(b7)
        b7 = ConvBN(192, (7, 1), padding=[(3, 3), (0, 0)],
                    name='branch7x7x3_3')(b7)
        b7 = ConvBN(192, (3, 3), strides=2, name='branch7x7x3_4')(b7)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # E_2 (pytorch-fid) uses max pool

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name='branch1x1')(x)
        b3 = ConvBN(384, (1, 1), name='branch3x3_1')(x)
        b3a = ConvBN(384, (1, 3), padding=[(0, 0), (1, 1)],
                     name='branch3x3_2a')(b3)
        b3b = ConvBN(384, (3, 1), padding=[(1, 1), (0, 0)],
                     name='branch3x3_2b')(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name='branch3x3dbl_1')(x)
        bd = ConvBN(384, (3, 3), padding=1, name='branch3x3dbl_2')(bd)
        bda = ConvBN(384, (1, 3), padding=[(0, 0), (1, 1)],
                     name='branch3x3dbl_3a')(bd)
        bdb = ConvBN(384, (3, 1), padding=[(1, 1), (0, 0)],
                     name='branch3x3dbl_3b')(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = nn.max_pool(x, (3, 3), (1, 1), 'SAME')
        else:
            bp = _avg_pool_cip_false(x)
        bp = ConvBN(192, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns dict(pool3 (N,2048), spatial (N,2023), logits (N,num_classes))."""
    num_classes: int = 1008  # TF graph classes; torchvision ckpts use 1000

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        # x: (N, 299, 299, 3) in [-1, 1]
        x = ConvBN(32, (3, 3), strides=2, name='Conv2d_1a_3x3')(x)
        x = ConvBN(32, (3, 3), name='Conv2d_2a_3x3')(x)
        x = ConvBN(64, (3, 3), padding=1, name='Conv2d_2b_3x3')(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = ConvBN(80, (1, 1), name='Conv2d_3b_1x1')(x)
        x = ConvBN(192, (3, 3), name='Conv2d_4a_3x3')(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = InceptionA(32, name='Mixed_5b')(x)
        x = InceptionA(64, name='Mixed_5c')(x)
        x = InceptionA(64, name='Mixed_5d')(x)
        x = InceptionB(name='Mixed_6a')(x)
        x = InceptionC(128, name='Mixed_6b')(x)
        x = InceptionC(160, name='Mixed_6c')(x)
        x = InceptionC(160, name='Mixed_6d')(x)
        x = InceptionC(192, name='Mixed_6e')(x)
        # ADM 'spatial' features: first 7 channels of mixed_6/conv (the
        # Mixed_6e output in TF naming), flattened (evaluator.py usage)
        spatial = x[..., :7].reshape(x.shape[0], -1)
        x = InceptionD(name='Mixed_7a')(x)
        x = InceptionE(name='Mixed_7b')(x)
        x = InceptionE(use_max_pool=True, name='Mixed_7c')(x)
        pool3 = jnp.mean(x, axis=(1, 2))  # (N, 2048)
        logits = nn.Dense(self.num_classes, name='fc')(pool3)
        return {'pool3': pool3, 'spatial': spatial, 'logits': logits}


def preprocess_uint8(images: Array, size: int = 299) -> Array:
    """uint8 (N, H, W, 3) -> float (N, 299, 299, 3) in [-1, 1]."""
    x = images.astype(jnp.float32) / 255.0
    n, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (n, size, size, c), method='bilinear')
    return x * 2.0 - 1.0


# ---------------------------------------------------------------------------
# Weight import (torchvision / pytorch-fid state dict, BN folded)
# ---------------------------------------------------------------------------

def _fold_bn(conv_w: np.ndarray, bn_w, bn_b, bn_mean, bn_var,
             eps: float = 1e-3) -> Tuple[np.ndarray, np.ndarray]:
    """Fold BatchNorm into conv kernel+bias. conv_w: torch (O,I,kh,kw)."""
    scale = bn_w / np.sqrt(bn_var + eps)
    w = conv_w * scale[:, None, None, None]
    b = bn_b - bn_mean * scale
    return w, b


def convert_inception_state_dict(sd: Dict[str, np.ndarray],
                                 num_classes: int = 1008) -> Dict[str, Any]:
    """torchvision inception_v3 (or pytorch-fid FIDInceptionV3) state dict ->
    flax params with BN folded. Torch conv (O,I,kh,kw) -> flax (kh,kw,I,O)."""
    flat: Dict[str, np.ndarray] = {}

    def conv_bn(tpre: str, fpre: str):
        w, b = _fold_bn(sd[f'{tpre}.conv.weight'],
                        sd[f'{tpre}.bn.weight'], sd[f'{tpre}.bn.bias'],
                        sd[f'{tpre}.bn.running_mean'],
                        sd[f'{tpre}.bn.running_var'])
        flat[f'{fpre}/conv/kernel'] = np.ascontiguousarray(
            w.transpose(2, 3, 1, 0))
        flat[f'{fpre}/conv/bias'] = b

    stem = ['Conv2d_1a_3x3', 'Conv2d_2a_3x3', 'Conv2d_2b_3x3',
            'Conv2d_3b_1x1', 'Conv2d_4a_3x3']
    for name in stem:
        conv_bn(name, name)

    def block(tname: str, branches: Sequence[str]):
        for br in branches:
            conv_bn(f'{tname}.{br}', f'{tname}/{br}')

    a_br = ['branch1x1', 'branch5x5_1', 'branch5x5_2', 'branch3x3dbl_1',
            'branch3x3dbl_2', 'branch3x3dbl_3', 'branch_pool']
    for m in ('Mixed_5b', 'Mixed_5c', 'Mixed_5d'):
        block(m, a_br)
    block('Mixed_6a', ['branch3x3', 'branch3x3dbl_1', 'branch3x3dbl_2',
                       'branch3x3dbl_3'])
    c_br = ['branch1x1', 'branch7x7_1', 'branch7x7_2', 'branch7x7_3',
            'branch7x7dbl_1', 'branch7x7dbl_2', 'branch7x7dbl_3',
            'branch7x7dbl_4', 'branch7x7dbl_5', 'branch_pool']
    for m in ('Mixed_6b', 'Mixed_6c', 'Mixed_6d', 'Mixed_6e'):
        block(m, c_br)
    block('Mixed_7a', ['branch3x3_1', 'branch3x3_2', 'branch7x7x3_1',
                       'branch7x7x3_2', 'branch7x7x3_3', 'branch7x7x3_4'])
    e_br = ['branch1x1', 'branch3x3_1', 'branch3x3_2a', 'branch3x3_2b',
            'branch3x3dbl_1', 'branch3x3dbl_2', 'branch3x3dbl_3a',
            'branch3x3dbl_3b', 'branch_pool']
    for m in ('Mixed_7b', 'Mixed_7c'):
        block(m, e_br)

    if 'fc.weight' in sd:
        flat['fc/kernel'] = np.ascontiguousarray(sd['fc.weight'].T)
        flat['fc/bias'] = sd['fc.bias']

    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        parts = path.split('/')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v.astype(np.float32)
    return tree


def load_inception(weights_path: Optional[str] = None
                   ) -> Tuple[InceptionV3, Dict[str, Any]]:
    """(module, params). With no weights file: random init (tests/dev only —
    FID numbers then have no external meaning)."""
    model = InceptionV3()
    if weights_path is not None:
        from fitv2_tpu.ckpt.torch_import import load_torch_state_dict
        sd = load_torch_state_dict(weights_path)
        params = convert_inception_state_dict(sd)
    else:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 299, 299, 3)))['params']
    return model, params


def compute_activations(model: InceptionV3, params, images_uint8: np.ndarray,
                        batch_size: int = 64) -> Dict[str, np.ndarray]:
    """Batched activation extraction: uint8 (N,H,W,3) -> pool3/spatial/softmax."""
    apply = jax.jit(lambda x: model.apply({'params': params},
                                          preprocess_uint8(x)))
    outs = {'pool3': [], 'spatial': [], 'softmax': []}
    n = images_uint8.shape[0]
    for i in range(0, n, batch_size):
        chunk = images_uint8[i:i + batch_size]
        if chunk.shape[0] < batch_size:  # pad to static shape, then trim
            pad = batch_size - chunk.shape[0]
            chunk = np.concatenate([chunk, np.zeros(
                (pad,) + chunk.shape[1:], chunk.dtype)])
            res = apply(jnp.asarray(chunk))
            res = {k: np.asarray(v)[:batch_size - pad]
                   for k, v in res.items()}
        else:
            res = {k: np.asarray(v) for k, v in apply(jnp.asarray(chunk)).items()}
        outs['pool3'].append(res['pool3'])
        outs['spatial'].append(res['spatial'])
        outs['softmax'].append(
            np.asarray(jax.nn.softmax(res['logits'], axis=-1)))
    return {k: np.concatenate(v) for k, v in outs.items()}
