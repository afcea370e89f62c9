"""Frozen representation encoders for REPA alignment.

Replaces the reference encoder zoo loader
(/root/reference/fit/utils/utils.py:267-375 ``load_encoders`` for
dinov2/dinov1/clip/mae/jepa/mocov3 via torch.hub) with local-checkpoint
flax ViTs (this environment has zero egress; torch.hub downloads are not
possible) plus per-encoder preprocessing (``preprocess_raw_image``,
utils.py:378-400). For training pipelines the recommended path is
precomputing encoder features into the latent shards ('repa_target' field),
which removes the frozen teacher from the train step entirely.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from fitv2_tpu.encoders.vit import (
    VisionTransformer, ViTBlock, convert_vit_state_dict, vit_base,
    vit_huge, vit_large,
)

# (mean, std) in [0,1] space, per encoder family (reference
# preprocess_raw_image, utils.py:378-400)
_IMAGENET = (np.array([0.485, 0.456, 0.406]), np.array([0.229, 0.224, 0.225]))
_CLIP = (np.array([0.48145466, 0.4578275, 0.40821073]),
         np.array([0.26862954, 0.26130258, 0.27577711]))

_PREPROC = {
    'dinov2': _IMAGENET, 'dinov1': _IMAGENET, 'mae': _IMAGENET,
    'jepa': _IMAGENET, 'mocov3': _IMAGENET, 'clip': _CLIP,
}

_ARCHS: Dict[str, Callable[..., VisionTransformer]] = {
    'vit_base': vit_base, 'vit_large': vit_large, 'vit_huge': vit_huge,
}


def preprocess_raw_image(x: jnp.ndarray, enc_type: str) -> jnp.ndarray:
    """uint8/float [0,255] NHWC -> encoder-normalized float NHWC."""
    family = enc_type.split('-')[0]
    mean, std = _PREPROC.get(family, _IMAGENET)
    x = x.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(
        std, jnp.float32)


def load_encoders(enc_type: str, weights_path: Optional[str] = None,
                  arch: str = 'vit_base'
                  ) -> Tuple[Any, Any, Callable]:
    """(module, params, preprocess_fn) for a frozen teacher.

    enc_type families: dinov2 (LayerScale + cls/register tokens + learned
    pos embed, encoders/dinov2.py — reference utils.py:267-300),
    dinov1/mae/jepa/mocov3 (generic pre-norm ViT, encoders/vit.py) and
    clip (pre-LN tower with class embedding + quickGELU, encoders/clip.py —
    reference utils.py:301-320).
    weights_path: local torch state dict (timm/jepa/torch-hub naming, or
    OpenAI clip full/visual checkpoint). Without one the encoder is
    randomly initialized — useful only for pipeline tests.
    """
    family = enc_type.split('-')[0]
    if family == 'dinov2':
        from fitv2_tpu.encoders.dinov2 import (
            convert_dinov2_state_dict, dinov2_vitb14, dinov2_vitg14,
            dinov2_vitl14, dinov2_vits14)
        builders = {'vit_small': dinov2_vits14, 'vit_base': dinov2_vitb14,
                    'vit_large': dinov2_vitl14, 'vit_giant': dinov2_vitg14}
        model = builders.get(arch, dinov2_vitb14)()
        if weights_path is not None:
            from fitv2_tpu.ckpt.torch_import import load_torch_state_dict
            sd = load_torch_state_dict(weights_path)
            params = convert_dinov2_state_dict(sd)
            if 'register_tokens' in sd:
                model = model.clone(
                    num_register_tokens=sd['register_tokens'].shape[1])
        else:
            import jax
            params = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 224, 224, 3)))['params']
        return model, params, lambda x: preprocess_raw_image(x, enc_type)
    if family == 'clip':
        from fitv2_tpu.encoders.clip import (
            clip_vit_b16, clip_vit_l14, convert_clip_visual_state_dict)
        model = clip_vit_l14() if arch in ('vit_large', 'clip_vit_l14') \
            else clip_vit_b16()
        if weights_path is not None:
            from fitv2_tpu.ckpt.torch_import import load_torch_state_dict
            params = convert_clip_visual_state_dict(
                load_torch_state_dict(weights_path))
        else:
            import jax
            params = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, model.image_size, model.image_size, 3))
            )['params']
        return model, params, lambda x: preprocess_raw_image(x, enc_type)
    model = _ARCHS[arch]()
    if weights_path is not None:
        from fitv2_tpu.ckpt.torch_import import load_torch_state_dict
        params = convert_vit_state_dict(load_torch_state_dict(weights_path))
    else:
        import jax
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, model.img_size, model.img_size, 3)))['params']
    return model, params, lambda x: preprocess_raw_image(x, enc_type)


__all__ = [
    'VisionTransformer', 'ViTBlock', 'convert_vit_state_dict', 'vit_base',
    'vit_huge', 'vit_large', 'load_encoders', 'preprocess_raw_image',
    'DinoV2ViT',
]

from fitv2_tpu.encoders.dinov2 import DinoV2ViT  # noqa: E402
