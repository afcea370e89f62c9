"""Flow-matching transport, paths, and samplers (reference fit/scheduler/transport)."""

from fitv2_tpu.flow.path import GVPCPlan, ICPlan, VPCPlan, expand_t_like_x
from fitv2_tpu.flow.samplers import (
    ADAPTIVE_TABLEAUS, Sampler, cfg_model_fn, euler_sample,
    euler_sample_extrapolated, ode_adaptive, ode_dopri5, ode_euler,
    ode_heun, ode_midpoint, ode_rk4,
    sde_sample,
)
from fitv2_tpu.flow.transport import (
    ModelType, PathType, SNRType, Transport, WeightType, create_transport,
    masked_loss_ratio, mean_flat,
)

__all__ = [
    'GVPCPlan', 'ICPlan', 'VPCPlan', 'expand_t_like_x',
    'ADAPTIVE_TABLEAUS', 'Sampler', 'cfg_model_fn', 'euler_sample',
    'euler_sample_extrapolated', 'ode_adaptive', 'ode_dopri5', 'ode_euler',
    'ode_heun', 'ode_midpoint', 'ode_rk4', 'sde_sample',
    'ModelType', 'PathType', 'SNRType', 'Transport', 'WeightType',
    'create_transport', 'masked_loss_ratio', 'mean_flat',
]
