"""Shared config field-override syntax (config.apply_overrides).

One syntax, three consumers: bench.py (VELO_BENCH_OVERRIDES), the longrun
variant lanes, and `velo_tpu.cli --set` / `--fast`.  These tests pin the
coercion rules and the CLI preset plumbing so a syntax drift can't silently
change what a recorded A/B lane actually ran.
"""
from velo_tpu.config import FAST_PRESET, VeloConfig, apply_overrides


def test_apply_overrides_types_and_subconfigs():
    cfg = VeloConfig()
    out = apply_overrides(
        cfg,
        "s:lm_iters=6+prior_obs_gain=2.5,v:klt_iters_fb=2 "
        "l:edges_per_sector=3 m:edge_capacity=1024 s:deskew_exact_lag=1",
    )
    assert out.solver.lm_iters == 6
    assert out.solver.prior_obs_gain == 2.5
    assert out.solver.deskew_exact_lag is True
    assert out.vision.klt_iters_fb == 2
    assert out.lidar.edges_per_sector == 3
    assert out.map.edge_capacity == 1024
    # Untouched fields survive, original is not mutated (frozen dataclass).
    assert out.solver.lm_iters != cfg.solver.lm_iters or cfg.solver.lm_iters == 6
    assert cfg.solver.prior_obs_gain == VeloConfig().solver.prior_obs_gain


def test_apply_overrides_str_field():
    out = apply_overrides(VeloConfig(), "s:prior_obs_impl=deferred")
    assert out.solver.prior_obs_impl == "deferred"


def test_apply_overrides_empty_spec_is_identity():
    cfg = VeloConfig()
    assert apply_overrides(cfg, "") == cfg


def test_fast_preset_applies():
    out = apply_overrides(VeloConfig(), FAST_PRESET)
    assert out.solver.prior_obs_impl == "deferred_tail"


def test_cli_fast_and_set_compose():
    from velo_tpu.cli import _apply_cli_overrides, build_parser

    args = build_parser().parse_args(
        ["--synthetic", "--fast", "--set", "s:lm_iters=3"])
    out = _apply_cli_overrides(VeloConfig(), args)
    assert out.solver.prior_obs_impl == "deferred_tail"
    assert out.solver.lm_iters == 3

    # --set wins over --fast on the same field.
    args = build_parser().parse_args(
        ["--synthetic", "--fast", "--set", "s:prior_obs_impl=staged"])
    out = _apply_cli_overrides(VeloConfig(), args)
    assert out.solver.prior_obs_impl == "staged"

    # Neither flag -> identity.
    args = build_parser().parse_args(["--synthetic"])
    assert _apply_cli_overrides(VeloConfig(), args) == VeloConfig()
