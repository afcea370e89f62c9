"""Exact state-dict key/shape inventory of reference FiT checkpoints.

Derived from the reference module construction — fit_model.py:86-114
(x/t/y embedders, global_adaLN_modulation Sequential index 1, blocks
ModuleList, final_layer), modules.py:31 (PatchEmbedder.proj),
modules.py:45-48 (TimestepEmbedder.mlp indices 0/2), modules.py:140-152
(Attention.qkv/proj, create_norm q/k), modules.py:247-268 (timm SwiGLU
fc1_g/fc1_x/fc2, Mlp fc1/fc2, adaLN Sequential indices), modules.py:282-289
(FinalLayer.norm_final/linear/adaLN index 1), norms.py:19-50 (affine only
for w_layernorm/rmsnorm). RoPE buffers are registered persistent=False
(rope.py:163-170) and never enter the state dict.

This is the trust anchor for ckpt/torch_import.py: the published
model_ema.safetensors of FiTv2-XL/3B/HR (README.md:54-55,110-111) carries
exactly these keys (EMA state dicts share the module naming; torch.compile
runs add an `_orig_mod.` prefix which the importer strips).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

Shape = Tuple[int, ...]

# published model configs (reference configs/fitv2/*.yaml, configs/fit/*.yaml)
PUBLISHED_CONFIGS = {
    'fitv2_xl': dict(hidden_size=1152, depth=36, num_heads=16, patch_size=2,
                     in_channels=4, num_classes=1000, learn_sigma=False,
                     use_swiglu=True, use_swiglu_large=False,
                     q_norm='layernorm', k_norm='layernorm',
                     adaln_type='lora', adaln_lora_dim=288),
    'fitv2_3b': dict(hidden_size=2304, depth=40, num_heads=24, patch_size=2,
                     in_channels=4, num_classes=1000, learn_sigma=False,
                     use_swiglu=True, use_swiglu_large=False,
                     q_norm='layernorm', k_norm='layernorm',
                     adaln_type='lora', adaln_lora_dim=576),
    # HR fine-tunes share the XL/3B architecture (only rope/runtime params
    # differ, configs/fitv2/config_fitv2_hr_xl.yaml:27-51) -> same inventory
    'fitv2_hr_xl': dict(hidden_size=1152, depth=36, num_heads=16,
                        patch_size=2, in_channels=4, num_classes=1000,
                        learn_sigma=False, use_swiglu=True,
                        use_swiglu_large=False, q_norm='layernorm',
                        k_norm='layernorm', adaln_type='lora',
                        adaln_lora_dim=288),
    'fitv1_xl': dict(hidden_size=1152, depth=28, num_heads=16, patch_size=2,
                     in_channels=4, num_classes=1000, learn_sigma=True,
                     use_swiglu=True, use_swiglu_large=True,
                     q_norm=None, k_norm=None,
                     adaln_type='normal', adaln_lora_dim=None),
}


def _linear(spec, name: str, d_in: int, d_out: int, bias: bool = True):
    spec[name + '.weight'] = (d_out, d_in)  # torch layout (out, in)
    if bias:
        spec[name + '.bias'] = (d_out,)


def _norm_affine(norm_type: Optional[str]) -> bool:
    # create_norm: plain 'layernorm' has no affine; w_layernorm/rmsnorm do
    return norm_type in ('w_layernorm', 'rmsnorm', 'w_rmsnorm')


def _adaln(spec, prefix: str, d: int, n_chunks: int, adaln_type: str,
           lora_dim: Optional[int], bias: bool = True):
    if adaln_type == 'lora':
        # Sequential(SiLU, Linear, Linear) -> indices 1, 2
        _linear(spec, prefix + '.1', d, lora_dim, bias)
        _linear(spec, prefix + '.2', lora_dim, n_chunks * d, bias)
    elif adaln_type == 'swiglu':
        hidden = (d // 4) * 3 if n_chunks == 6 else d // 2
        _linear(spec, prefix + '.fc1_g', d, hidden, bias)
        _linear(spec, prefix + '.fc1_x', d, hidden, bias)
        _linear(spec, prefix + '.fc2', hidden, n_chunks * d, bias)
    else:  # 'normal': Sequential(SiLU, Linear) -> index 1
        _linear(spec, prefix + '.1', d, n_chunks * d, bias)


def fit_state_dict_spec(
    *, hidden_size: int, depth: int, num_heads: int, patch_size: int = 2,
    in_channels: int = 4, num_classes: int = 1000, mlp_ratio: float = 4.0,
    class_dropout_prob: float = 0.1, learn_sigma: bool = False,
    use_swiglu: bool = True, use_swiglu_large: bool = False,
    norm_type: str = 'layernorm', q_norm: Optional[str] = None,
    k_norm: Optional[str] = None, qk_norm_weight: bool = False,
    qkv_bias: bool = True, ffn_bias: bool = True, adaln_bias: bool = True,
    adaln_type: str = 'normal', adaln_lora_dim: Optional[int] = None,
) -> Dict[str, Shape]:
    """Return {torch key: shape} for a reference FiT model config."""
    d = hidden_size
    dh = d // num_heads
    out_channels = in_channels * 2 if learn_sigma else in_channels
    spec: Dict[str, Shape] = {}

    _linear(spec, 'x_embedder.proj', in_channels * patch_size ** 2, d)
    _linear(spec, 't_embedder.mlp.0', 256, d)
    _linear(spec, 't_embedder.mlp.2', d, d)
    use_cfg = class_dropout_prob > 0
    spec['y_embedder.embedding_table.weight'] = (
        num_classes + int(use_cfg), d)
    if adaln_type == 'lora':
        _linear(spec, 'global_adaLN_modulation.1', d, 6 * d, adaln_bias)

    def qk_type(t):
        if t == 'layernorm' and qk_norm_weight:
            return 'w_layernorm'
        return t

    mlp_hidden = int(d * mlp_ratio)
    swiglu_hidden = mlp_hidden if use_swiglu_large else (mlp_hidden * 2) // 3
    for i in range(depth):
        pre = f'blocks.{i}'
        if _norm_affine(norm_type):
            spec[f'{pre}.norm1.weight'] = (d,)
            spec[f'{pre}.norm2.weight'] = (d,)
        _linear(spec, f'{pre}.attn.qkv', d, 3 * d, qkv_bias)
        if _norm_affine(qk_type(q_norm)):
            spec[f'{pre}.attn.q_norm.weight'] = (dh,)
        if _norm_affine(qk_type(k_norm)):
            spec[f'{pre}.attn.k_norm.weight'] = (dh,)
        _linear(spec, f'{pre}.attn.proj', d, d)
        if use_swiglu:
            _linear(spec, f'{pre}.mlp.fc1_g', d, swiglu_hidden, ffn_bias)
            _linear(spec, f'{pre}.mlp.fc1_x', d, swiglu_hidden, ffn_bias)
            _linear(spec, f'{pre}.mlp.fc2', swiglu_hidden, d, ffn_bias)
        else:
            _linear(spec, f'{pre}.mlp.fc1', d, mlp_hidden, ffn_bias)
            _linear(spec, f'{pre}.mlp.fc2', mlp_hidden, d, ffn_bias)
        _adaln(spec, f'{pre}.adaLN_modulation', d, 6, adaln_type,
               adaln_lora_dim, adaln_bias)

    if _norm_affine(norm_type):
        spec['final_layer.norm_final.weight'] = (d,)
    _linear(spec, 'final_layer.linear', d,
            patch_size * patch_size * out_channels)
    # FinalLayer uses the 2-layer 'normal' head unless adaln_type == 'swiglu'
    fl_type = 'swiglu' if adaln_type == 'swiglu' else 'normal'
    _adaln(spec, 'final_layer.adaLN_modulation', d, 2, fl_type, None,
           adaln_bias)
    return spec
