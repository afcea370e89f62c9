"""Config system: OmegaConf multi-file merge + target/params instantiation.

Port of the reference's de-facto plugin registry
(/root/reference/fit/utils/utils.py:76-93 ``instantiate_from_config`` /
``get_obj_from_str`` and the trainer's left-to-right OmegaConf merge,
train_fitv2.py:73-79, 174-181), including the ``${tuple:...}`` resolver
(train_fitv2.py:48-50). Falls back to plain-dict configs when omegaconf is
unavailable.
"""

from __future__ import annotations

import importlib
from typing import Any, Iterable, Mapping, Sequence


def get_obj_from_str(string: str, reload: bool = False) -> Any:
    module, cls = string.rsplit('.', 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def _to_plain(cfg: Any) -> Any:
    try:
        from omegaconf import OmegaConf
        from omegaconf.basecontainer import BaseContainer
        if isinstance(cfg, BaseContainer):
            return OmegaConf.to_container(cfg, resolve=True)
    except ImportError:
        pass
    return cfg


def instantiate_from_config(config: Mapping[str, Any], **extra) -> Any:
    """{'target': 'pkg.mod.Cls', 'params': {...}} -> Cls(**params, **extra)."""
    config = _to_plain(config)
    if 'target' not in config:
        if config in ('__is_first_stage__', '__is_unconditional__'):
            return None
        raise KeyError('Expected key `target` to instantiate.')
    params = dict(config.get('params') or {})
    params.update(extra)
    return get_obj_from_str(config['target'])(**params)


def _register_tuple_resolver() -> None:
    from omegaconf import OmegaConf
    if not OmegaConf.has_resolver('tuple'):
        OmegaConf.register_new_resolver(
            'tuple', lambda *args: tuple(args))


def deep_merge(base: dict, override: dict) -> dict:
    """Recursive right-wins merge (OmegaConf.merge semantics for mappings)."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _resolve_tuples(node: Any) -> Any:
    """Minimal '${tuple:a, b}' resolver (reference train_fitv2.py:48-50)."""
    if isinstance(node, dict):
        return {k: _resolve_tuples(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_tuples(v) for v in node]
    if isinstance(node, str) and node.startswith('${tuple:'):
        body = node[len('${tuple:'):].rstrip('}')
        items = []
        for part in body.split(','):
            part = part.strip()
            try:
                items.append(int(part))
            except ValueError:
                try:
                    items.append(float(part))
                except ValueError:
                    items.append(part)
        return tuple(items)
    return node


def load_config(paths: Sequence[str] | str):
    """Load + left-to-right merge YAML configs (train_fitv2.py:174-181).

    Uses OmegaConf when available (full interpolation support); otherwise a
    pyyaml deep-merge with the ${tuple:...} resolver — returns a plain dict.
    """
    if isinstance(paths, str):
        paths = [paths]
    try:
        from omegaconf import OmegaConf
        _register_tuple_resolver()
        configs = [OmegaConf.load(p) for p in paths]
        return OmegaConf.merge(*configs) if len(configs) > 1 else configs[0]
    except ImportError:
        import yaml
        merged: dict = {}
        for p in paths:
            with open(p) as f:
                merged = deep_merge(merged, yaml.safe_load(f) or {})
        return _resolve_tuples(merged)


# Reference dotted targets -> this package's equivalents, so the published
# YAML configs work verbatim (configs/fitv2/config_fitv2_xl.yaml:25 etc.)
REFERENCE_TARGET_MAP = {
    'fit.model.fit_model.FiT': 'fitv2_tpu.models.fit.FiT',
    'fit.model.fit_model_lwd.FiTLwD': 'fitv2_tpu.models.fit_lwd.FiTLwD',
    'fit.model.fit_model_lwd.FiTLwD_sharedenc_sepdec':
        'fitv2_tpu.models.fit_lwd_sharedenc.FiTLwDSharedEncSepDec',
    'fit.model.fit_model_lwd_bk.FiTLwD_sharedenc_sepdec':
        'fitv2_tpu.models.fit_lwd_sharedenc.FiTLwDSharedEncSepDec',
    'fit.model.bfm.FiT': 'fitv2_tpu.models.bfm.BFM',
    'fit.data.in1k_latent_dataset.INLatentLoader':
        'fitv2_tpu.data.latent_dataset.INLatentLoader',
}

# Reference FiT kwargs with no TPU-side equivalent (handled elsewhere or
# CUDA-only); silently dropped by config_to_model:
#   abs_pos_embed (always null in published configs), pretrain_ckpt /
#   ignore_keys / finetune (checkpoint loading lives in fitv2_tpu.ckpt),
#   save_attention (attention viz uses capture hooks instead).
_DROPPED_KEYS = {'abs_pos_embed', 'pretrain_ckpt', 'ignore_keys', 'finetune',
                 'overlap', 'global_cls'}


def config_to_model(network_config: Mapping[str, Any], **overrides) -> Any:
    """Instantiate a model from a reference-style network_config, remapping
    reference targets and filtering params our dataclasses don't take."""
    cfg = dict(_to_plain(network_config))
    target = REFERENCE_TARGET_MAP.get(cfg.get('target'), cfg.get('target'))
    params = {k: v for k, v in dict(cfg.get('params') or {}).items()
              if k not in _DROPPED_KEYS}
    cls = get_obj_from_str(target)
    # drop anything the target doesn't accept (reference models take **kwargs)
    import dataclasses as _dc
    if _dc.is_dataclass(cls):
        fields = {f.name for f in _dc.fields(cls)}
        unknown = set(params) - fields
        if unknown:
            import warnings
            warnings.warn(f'config_to_model: dropping unknown params '
                          f'{sorted(unknown)} for {target}')
        params = {k: v for k, v in params.items() if k in fields}
    params.update(overrides)
    return cls(**params)
