"""Test configuration: run everything on an 8-device virtual CPU mesh.

The axon sitecustomize force-sets jax_platforms='axon,cpu' via jax.config
(overriding the JAX_PLATFORMS env var), so we must override back through
jax.config AFTER importing jax. XLA_FLAGS still must be set before the CPU
backend initializes.
"""

import os
import sys

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')

import pytest  # noqa: E402


@pytest.fixture(scope='session', autouse=True)
def eight_devices():
    devs = jax.devices()
    assert devs[0].platform == 'cpu', f'tests must run on CPU, got {devs[0]}'
    assert len(devs) == 8, f'expected 8 virtual cpu devices, got {len(devs)}'
    return devs


def pytest_addoption(parser):
    parser.addoption(
        '--slow', action='store_true', default=False,
        help='also run tests marked slow (the full tier; see README)')


# Tests measured >= ~25 s serial (single-core box; duration runs
# 2026-08-17 full suite 4959 s, 2026-08-18 fast tier re-timed solo 639 s
# before the latest exclusions). Marked centrally so the tier assignment
# has one source of truth; modules that are slow wholesale carry their own
# `pytestmark = pytest.mark.slow` instead (test_xl_scale_goldens,
# test_overfit_e2e). Fast tier after exclusion: ~9 min serial. NOTE when
# re-timing: run SOLO — concurrent TPU probes or extra pytest processes on
# this box inflate wall time ~2x.
_SLOW_TESTS = {
    'test_lwd_recipes.py': ['test_finetune_recipe',
                            'test_finetune_only_updates_forecaster',
                            'test_multiscale_recipe',
                            'test_cli_train_lwd_smoke'],
    'test_fid_pipeline_e2e.py': ['test_sample_to_fid'],
    'test_lwd_trainer.py': ['test_lwd_trainer_loop'],
    'test_lwd.py': ['test_lwd_train_step_reduces_loss',
                    'test_sample_and_cfg_shapes',
                    'test_forward_run_layer_segments_differ',
                    'test_sample_maruyama_cfg',
                    'test_fourier_basis_output',
                    'test_shared_trunk_blocks',
                    'test_repa_head_and_alignment',
                    'test_sample_intermediates_and_representations'],
    'test_lwd_sharedenc.py': ['test_forward_run_layer_finetune_modes',
                              'test_sample_maruyama_cfg_runs',
                              'test_sample_wo_cfg_family_returns',
                              'test_sample_maruyama_global_cfg',
                              'test_sample_cfg_guidance_window',
                              'test_forward_run_layer_returns_projection',
                              'test_sample_maruyama_plain_and_intermediates'],
    'test_trainer.py': ['test_trainer_end_to_end_with_resume',
                        'test_trainer_came_optimizer',
                        'test_trainer_ddpm_objective_fitv1',
                        'test_trainer_pipeline_parallel'],
    'test_pipeline_parallel.py': ['test_pp_train_step_reduces_loss',
                                  'test_pp_gradients_match_reference',
                                  'test_pp_composes_with_grad_accumulation'],
    'test_lwd_distill.py': ['test_distill_step_runs_and_reduces_loss'],
    'test_evaluator_e2e.py': ['test_compute_all_identical_batches'],
    'test_sample_pipeline.py': ['test_sampler_with_vae_uint8',
                                'test_sampler_latents_only'],
    'test_eval.py': ['test_inception_forward_shapes',
                     'test_inception_importer_covers_init_tree'],
    'test_lwd_multiscale.py': ['test_sample_multiscale_runs'],
    'test_cli.py': ['test_cli_train_smoke', 'test_cli_evaluate_smoke'],
    'test_train.py': ['test_train_step_reduces_loss',
                      'test_sharded_train_step_on_mesh',
                      'test_finetune_freeze_by_pattern',
                      'test_grad_accum_multisteps'],
    'test_ckpt_key_inventory.py': [
        'test_inventory_converts_fully_and_matches_flax_tree'],
    'test_timestep_sampler.py': ['test_ddpm_step_accepts_importance_batch'],
    'test_quant.py': ['test_fit_int8_calibrated_forward',
                      'test_build_sampler_int8_serving',
                      'test_fitlwd_int8_sampler_runs',
                      'test_prequantized_weights_match_dynamic'],
    'test_gan_ddpm_steps.py': ['test_ddpm_train_step_fitv1',
                               'test_gan_steps'],
    'test_vae.py': ['test_importer_covers_init_tree'],
    'test_losses.py': ['test_discriminator_shapes_and_grads',
                       'test_lpips_zero_for_identical_inputs'],
    'test_sequence_parallel.py': ['test_sp_train_step_grads_match'],
    'test_bfm.py': ['test_bfm_is_sharedenc', 'test_bfm_samplers_run',
                    'test_bfm_forward_run_layer_and_repa',
                    'test_split_decay_param_labels'],
    'test_eval_hook.py': ['test_inline_eval_hook_preview'],
    'test_prepare_latents.py': ['test_prepared_shards_drive_one_train_step',
                                'test_feature_matches_unpatchify_and_flip'],
    'test_attention_viz.py': ['test_capture_and_rollout'],
}
def pytest_collection_modifyitems(config, items):
    """Two test tiers: `pytest tests/` = fast tier (~10 min, gates work);
    `pytest tests/ --slow` = full tier (adds the heavy e2e/scale goldens,
    ~80 min serial)."""
    for item in items:
        names = _SLOW_TESTS.get(item.fspath.basename, ())
        base = item.name.split('[')[0]
        if base in names:
            item.add_marker(pytest.mark.slow)
    if config.getoption('--slow'):
        return
    skip = pytest.mark.skip(reason='slow tier: pass --slow to run')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope='module', autouse=True)
def _clear_jax_caches_per_module():
    """Bound compile-cache/memory growth so the FULL suite survives one
    process (round-1 ran `pytest tests/` into an XLA SIGSEGV at ~46% from
    accumulated compiled executables; sharding was the workaround). Clearing
    per module keeps within-module caching (fast) while capping the
    process-wide footprint."""
    yield
    jax.clear_caches()
