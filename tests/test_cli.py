"""CLI surface tests (argument wiring; no device work)."""

import pytest

from gt_pyg_tpu.cli import build_parser


class TestParser:
    def test_train_defaults_match_production_recipe(self):
        p = build_parser()
        a = p.parse_args(["train", "--csv", "x.csv", "--out", "o"])
        assert a.epochs == 2000
        assert a.batch_size == 256
        assert a.lr == 1e-3
        assert a.warmup == 25 and a.t_max == 500
        assert a.norm == "bn" and not a.no_gate
        assert a.gt_aggregators == "sum,mean"
        assert a.aggregators == "sum,mean,max,std"
        assert a.clip_norm == 5.0

    def test_demo_flags(self):
        p = build_parser()
        a = p.parse_args(["train", "--csv", "x", "--out", "o",
                          "--demo-loss", "--min-lr", "0", "--warmup", "0",
                          "--head-norm", "--head-residual",
                          "--num-head-layers", "2", "--clip-norm", "1.0"])
        assert a.demo_loss and a.min_lr == 0.0 and a.head_norm

    def test_subcommands_exist(self):
        p = build_parser()
        for args in (["predict", "--ckpt", "c", "--csv", "x", "--out", "o"],
                     ["evaluate", "--ckpt", "c", "--csv", "x"],
                     ["info", "--ckpt", "c"]):
            assert p.parse_args(args).fn is not None

    def test_missing_required_errors(self):
        p = build_parser()
        with pytest.raises(SystemExit):
            p.parse_args(["train", "--csv", "x"])  # no --out

    def test_platform_flag(self):
        p = build_parser()
        a = p.parse_args(["--platform", "cpu", "info", "--ckpt", "c"])
        assert a.platform == "cpu"
