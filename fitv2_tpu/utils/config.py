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


def load_config(paths: Sequence[str] | str):
    """OmegaConf.load + left-to-right merge (reference train_fitv2.py:174-181)."""
    from omegaconf import OmegaConf
    _register_tuple_resolver()
    if isinstance(paths, str):
        paths = [paths]
    configs = [OmegaConf.load(p) for p in paths]
    return OmegaConf.merge(*configs) if len(configs) > 1 else configs[0]


def config_to_model(network_config: Mapping[str, Any], **overrides) -> Any:
    """Instantiate a model from a reference-style network_config.

    Translates reference FiT param names that differ here (none currently —
    the FiT flax module mirrors fit_model.py:21-116 keyword names).
    """
    return instantiate_from_config(network_config, **overrides)
