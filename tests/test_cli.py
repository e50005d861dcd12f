"""CLI smoke: synth generation + pretrain + sml + baseline end to end."""

import json
import os

import pytest

from sml_tpu.cli import main


def test_cli_full_pipeline(tmp_path, capsys):
    root = str(tmp_path)
    out = os.path.join(root, "synth")
    rc = main(["synth", "--out", out, "--users", "200", "--items", "100",
               "--periods", "6", "--interactions", "400", "--first-test",
               "2", "--neg-num", "29", "--seed", "3"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["n_users"] == 200

    pre = os.path.join(root, "pre.npz")
    rc = main(["pretrain", "--data-root", root, "--data-name", "synth",
               "--num-periods", "6", "--online-train-start", "2",
               "--online-test-start", "4", "--out", pre,
               "--epochs", "6", "--latent", "8", "--batch-size", "128"])
    assert rc == 0
    assert os.path.exists(pre)
    capsys.readouterr()  # drop pretrain output

    ckpt = os.path.join(root, "ck")
    rc = main(["sml", "--data-root", root, "--data-name", "synth",
               "--num-periods", "6", "--online-train-start", "2",
               "--online-test-start", "4", "--pre-model", pre,
               "--multi-num", "1", "--latent", "8",
               "--mf-sample", "alone", "--checkpoint-dir", ckpt,
               "--metrics-jsonl", os.path.join(root, "m.jsonl")])
    assert rc == 0
    out_text = capsys.readouterr().out
    summary = json.loads(out_text[out_text.index("{"):])
    assert "test_recall@5" in summary
    assert os.path.exists(os.path.join(ckpt, "manifest.json"))
    assert os.path.exists(os.path.join(root, "m.jsonl"))

    rc = main(["baseline", "--data-root", root, "--data-name", "synth",
               "--num-periods", "6", "--online-train-start", "2",
               "--online-test-start", "4", "--method", "fine",
               "--epochs", "2", "--latent", "8", "--pre-model", pre])
    assert rc == 0
