"""InceptionV3 numerical golden vs an independent torch twin.

VERDICT round-1 item #3: the flax InceptionV3 (eval/inception.py) replaces
the reference's TF1 evaluator graph but had no numerical anchor. The torch
twin (torchvision layout + pytorch-fid pooling patches, random weights AND
random BN running stats) lives in tools/gen_goldens.py; the golden npz is
~96 MB so it is generated on demand rather than committed.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

GOLDEN = os.path.join(os.path.dirname(__file__), 'goldens', 'inception.npz')
TOOLS = os.path.join(os.path.dirname(__file__), '..', 'tools')


@pytest.fixture(scope='module')
def golden():
    if not os.path.exists(GOLDEN):
        pytest.importorskip('torch')
        subprocess.run(
            [sys.executable, '-c',
             'import sys; sys.path.insert(0, %r); '
             'import gen_goldens; gen_goldens.gen_inception()' % TOOLS],
            check=True)
    return np.load(GOLDEN)


def test_pool3_spatial_logits_match_torch(golden):
    from fitv2_tpu.eval.inception import (
        InceptionV3, convert_inception_state_dict)
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith('sd:')}
    params = convert_inception_state_dict(sd)
    model = InceptionV3(num_classes=sd['fc.weight'].shape[0])
    x = golden['images'].astype(np.float32) / 255.0 * 2.0 - 1.0  # NHWC
    out = jax.jit(lambda p, xx: model.apply({'params': p}, xx))(params, x)
    np.testing.assert_allclose(np.asarray(out['pool3']), golden['pool3'],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out['spatial']), golden['spatial'],
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out['logits']), golden['logits'],
                               rtol=2e-4, atol=2e-3)
