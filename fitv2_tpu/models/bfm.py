"""BFM — block flow matching (standalone LwD variant with a shared encoder).

The reference's bfm.py (/root/reference/fit/model/bfm.py:18-829) runs a
SHARED representation-block encoder over the noisy tokens every segment
step (bfm.py:295-305: representation_x_embedder -> representation_blocks ->
c_repre = t_emb[:, None] + rep tokens -> global_adaLN_modulation2), then the
per-segment decoder blocks condition on the per-token c_repre — the same
architecture as fit_model_lwd_bk.py's sharedenc family, at the BFM configs
(config_bfm.yaml:17-47 small: hidden 384 / depth 24 / K=6 / 6 rep blocks;
config_bfm_XL.yaml:22-43: hidden 1152 / depth 30 / 20 rep blocks). Here it
is a configuration of FiTLwDSharedEncSepDec plus the optimizer param-group
helper the BFM trainer uses.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

from fitv2_tpu.models.fit_lwd_sharedenc import FiTLwDSharedEncSepDec


def BFM(**overrides) -> FiTLwDSharedEncSepDec:
    """Shared-encoder LwD at the BFM default config (config_bfm.yaml:17-47)."""
    cfg: Dict[str, Any] = dict(
        context_size=256, patch_size=2, in_channels=4, hidden_size=384,
        depth=24, num_heads=6, num_classes=1000, learn_sigma=False,
        use_sit=True, use_swiglu=True, q_norm='layernorm',
        k_norm='layernorm', adaln_type='lora', adaln_lora_dim=96,
        number_of_perflow=6, number_of_representation_blocks=6,
        repa_dim=768, n_patch_h=16, n_patch_w=16)
    cfg.update(overrides)
    return FiTLwDSharedEncSepDec(**cfg)


def split_decay_param_labels(params, no_decay_keywords: Tuple[str, ...] = (
        'bias', 'norm', 'embedding_table')) -> Any:
    """'decay'/'no_decay' label tree for optax.multi_transform — the
    per-group optimizer helper (reference fit/utils/utils.py:175-265)."""
    import jax

    def label(path, leaf):
        names = [str(getattr(k, 'key', k)).lower() for k in path]
        joined = '/'.join(names)
        if any(kw in joined for kw in no_decay_keywords):
            return 'no_decay'
        if leaf.ndim <= 1:
            return 'no_decay'
        return 'decay'

    return jax.tree_util.tree_map_with_path(label, params)
