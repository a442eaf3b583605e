"""End-to-end CLI smoke: tiny CSV → train → predict → evaluate → info →
resume, through ``gt_pyg_tpu.cli.main`` in-process (VERDICT round-3 item
7: the parser was tested but the command glue — checkpoint naming,
submission CSV writing, --resume restore — was not)."""

import json

import numpy as np
import pandas as pd
import pytest

from gt_pyg_tpu.cli import main
from gt_pyg_tpu.checkpoint import get_checkpoint_info, load_checkpoint

SMILES = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "CCCC", "CC(C)O",
          "CCOC", "c1ccncc1", "CCS", "CCCl", "CCBr", "CCCN",
          "CCCO", "CC(C)C", "CCCC(=O)O", "c1ccc(C)cc1",
          "CCOCC", "CC(N)C", "CCCS", "c1ccc(O)cc1",
          "CCCCC", "CC(=O)N", "CCCOC", "c1ccc(N)cc1"]

TINY = ["--hidden-dim", "16", "--num-layers", "1", "--num-heads", "2",
        "--batch-size", "8", "--batch-eval", "32",
        "--num-train", "16", "--num-val", "8"]


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "tiny.csv"
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "SMILES": SMILES,
        "Molecule Name": [f"M-{i}" for i in range(len(SMILES))],
        "LogD": np.round(rng.normal(1.0, 0.8, len(SMILES)), 3),
    })
    df.to_csv(p, index=False)
    return p


class TestCliEndToEnd:
    def test_train_predict_evaluate_info_resume(self, csv_path, tmp_path,
                                                capsys):
        out = tmp_path / "run"

        # ---- train (2 epochs, periodic resume checkpoint) ----
        rc = main(["train", "--csv", str(csv_path), "--endpoint", "LogD",
                   "--epochs", "2", "--save-every", "1",
                   "--out", str(out)] + TINY)
        assert rc == 0
        best = out / "best.ckpt"
        resume = out / "resume.ckpt"
        assert best.exists() and resume.exists()

        # checkpoint schema: version, config, state, extra provenance
        info = get_checkpoint_info(best)
        assert info["checkpoint_version"] == 1
        assert info["model_config"]["hidden_dim"] == 16
        assert info["extra"]["endpoints"] == ["LogD"]
        assert "train_mins" in info["extra"]
        # the resume checkpoint carries optimizer state + epoch
        full = load_checkpoint(resume)
        assert "optimizer_state_dict" in full
        assert int(full["epoch"]) == 2

        # ---- predict: submission CSV columns ----
        sub = tmp_path / "submission.csv"
        rc = main(["predict", "--ckpt", str(best), "--csv", str(csv_path),
                   "--out", str(sub)])
        assert rc == 0
        sdf = pd.read_csv(sub)
        assert "SMILES" in sdf.columns and "Molecule Name" in sdf.columns
        # inverse assay transform names the raw endpoint column (LogD is
        # identity-transformed so the column keeps its name)
        assert any("LogD" in c for c in sdf.columns)
        assert len(sdf) == len(SMILES)
        assert sdf.drop(columns=["SMILES", "Molecule Name"]) \
                  .notna().all().all()

        # raw mode: log-space predictions, one column per endpoint
        raw = tmp_path / "raw.csv"
        rc = main(["predict", "--ckpt", str(best), "--csv", str(csv_path),
                   "--out", str(raw), "--raw"])
        assert rc == 0
        assert "LogD" in pd.read_csv(raw).columns

        # ---- evaluate: metrics JSON on stdout ----
        rc = main(["evaluate", "--ckpt", str(best), "--csv",
                   str(csv_path), "--bootstrap", "10"])
        assert rc == 0
        cap = capsys.readouterr().out
        metrics = json.loads(cap[:cap.index("}\n{") + 1]
                             if "}\n{" in cap else cap)
        assert "LogD" in metrics and "MAE" in metrics["LogD"]

        # ---- info: metadata-only read ----
        rc = main(["info", "--ckpt", str(best)])
        assert rc == 0
        meta = json.loads(capsys.readouterr().out)
        assert meta["checkpoint_version"] == 1
        assert "model_state_dict" not in meta

        # ---- resume: restores epoch + optimizer and continues ----
        rc = main(["train", "--csv", str(csv_path), "--endpoint", "LogD",
                   "--epochs", "4", "--save-every", "1",
                   "--resume", str(resume), "--out", str(out)] + TINY)
        assert rc == 0
        full2 = load_checkpoint(out / "resume.ckpt")
        assert int(full2["epoch"]) == 4
        # optimizer state advanced (step count grows across the resume)
        def opt_step(ckpt):
            def find(d):
                if isinstance(d, dict):
                    for k, v in d.items():
                        if k == "count":
                            return np.asarray(v)
                        got = find(v)
                        if got is not None:
                            return got
                return None
            return find(ckpt["optimizer_state_dict"])

        s1, s2 = opt_step(full), opt_step(full2)
        if s1 is not None and s2 is not None:
            assert int(s2) > int(s1)
