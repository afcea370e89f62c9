"""Round trip: torch sd -> flax params (split basis) -> torch sd."""

import numpy as np
import pytest

from fitv2_tpu.ckpt.torch_export import export_fit_state_dict
from fitv2_tpu.ckpt.torch_import import convert_fit_state_dict


def _golden_sd():
    import os
    GOLD = np.load(os.path.join(os.path.dirname(__file__), 'goldens',
                                'fit_forward.npz'))
    sd = {k[len('sd.'):]: GOLD[k] for k in GOLD.files if k.startswith('sd.')}
    meta = {k: int(GOLD[k]) for k in ('depth', 'heads')}
    return sd, meta


@pytest.mark.parametrize('scan_blocks', [True, False])
def test_import_export_roundtrip(scan_blocks):
    sd, meta = _golden_sd()
    params = convert_fit_state_dict(
        sd, depth=meta['depth'], adaln_type='lora', scan_blocks=scan_blocks,
        num_heads=meta['heads'], rope_layout='split')
    back = export_fit_state_dict(
        params, depth=meta['depth'], adaln_type='lora',
        scan_blocks=scan_blocks, num_heads=meta['heads'],
        rope_layout='split')
    assert set(back) == set(sd), (
        sorted(set(sd) - set(back))[:5], sorted(set(back) - set(sd))[:5])
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)


def test_save_safetensors_roundtrip(tmp_path):
    from fitv2_tpu.ckpt.torch_export import save_safetensors
    from fitv2_tpu.ckpt.torch_import import load_torch_state_dict
    sd, meta = _golden_sd()
    p = str(tmp_path / 'export.safetensors')
    save_safetensors(sd, p)
    loaded = load_torch_state_dict(p)
    assert set(loaded) == set(sd)
    np.testing.assert_allclose(loaded['x_embedder.proj.weight'],
                               sd['x_embedder.proj.weight'])
