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


def test_cli_ingest_and_rank(tmp_path, capsys):
    import numpy as np

    root = str(tmp_path)
    # raw log: 600 events, 40 users x 30 items, increasing timestamps
    rng = np.random.default_rng(5)
    n = 600
    csv = os.path.join(root, "log.csv")
    with open(csv, "w") as fh:
        fh.write("user,item,ts\n")
        for t in range(n):
            fh.write(f"{rng.integers(1000, 1040)},"
                     f"{rng.integers(7000, 7030)},{t}\n")

    out = os.path.join(root, "mylog")
    rc = main(["ingest", "--csv", csv, "--out", out, "--periods", "6",
               "--first-test", "3", "--neg-num", "9"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["n_users"] <= 40 and info["n_items"] <= 30
    assert os.path.exists(os.path.join(out, "information.npy"))
    assert os.path.exists(os.path.join(out, "train", "0.npy"))
    assert os.path.exists(os.path.join(out, "test", "3.npy"))

    # pretrain on the ingested dataset, then full-catalog rank
    pre = os.path.join(root, "pre.npz")
    rc = main(["pretrain", "--data-root", root, "--data-name", "mylog",
               "--num-periods", "6", "--online-train-start", "3",
               "--online-test-start", "4", "--out", pre,
               "--epochs", "4", "--latent", "8", "--batch-size", "64"])
    assert rc == 0
    capsys.readouterr()

    rc = main(["rank", "--model", pre, "--users", "0,1,2", "-k", "5"])
    assert rc == 0
    lines = [json.loads(line)
             for line in capsys.readouterr().out.strip().splitlines()]
    assert [r["user"] for r in lines] == [0, 1, 2]
    for r in lines:
        assert len(r["items"]) == 5
        assert len(set(r["items"])) == 5
        assert r["scores"] == sorted(r["scores"], reverse=True)


def test_cli_sml_save_model_roundtrip(tmp_path, capsys):
    import numpy as np

    root = str(tmp_path)
    out = os.path.join(root, "synth")
    main(["synth", "--out", out, "--users", "120", "--items", "60",
          "--periods", "5", "--interactions", "300", "--first-test", "2",
          "--neg-num", "19", "--seed", "4"])
    pre = os.path.join(root, "pre.npz")
    main(["pretrain", "--data-root", root, "--data-name", "synth",
          "--num-periods", "5", "--online-train-start", "2",
          "--online-test-start", "3", "--out", pre, "--epochs", "4",
          "--latent", "8", "--batch-size", "64"])
    capsys.readouterr()

    saved = os.path.join(root, "final.npz")
    rc = main(["sml", "--data-root", root, "--data-name", "synth",
               "--num-periods", "5", "--online-train-start", "2",
               "--online-test-start", "3", "--pre-model", pre,
               "--multi-num", "1", "--latent", "8", "--mf-sample", "alone",
               "--save-model", saved])
    assert rc == 0
    capsys.readouterr()
    blob = np.load(saved)
    assert blob["user_emb"].shape == (120, 8)

    rc = main(["rank", "--model", saved, "--users", "5", "-k", "3"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["user"] == 5 and len(rec["items"]) == 3


def test_cli_warmstart_snapshot_dtype_compile_cache(tmp_path, capsys):
    """Round-2 flags: --theta-warmstart / --snapshot-dtype / --compile-cache."""
    import numpy as np

    root = str(tmp_path)
    out = os.path.join(root, "synth")
    main(["synth", "--out", out, "--users", "120", "--items", "60",
          "--periods", "5", "--interactions", "300", "--first-test", "2",
          "--neg-num", "19", "--seed", "11"])
    pre = os.path.join(root, "pre.npz")
    main(["pretrain", "--data-root", root, "--data-name", "synth",
          "--num-periods", "5", "--online-train-start", "2",
          "--online-test-start", "3", "--out", pre, "--epochs", "4",
          "--latent", "8", "--batch-size", "64"])
    capsys.readouterr()

    cache = os.path.join(root, "xla_cache")
    rc = main(["--compile-cache", cache,
               "sml", "--data-root", root, "--data-name", "synth",
               "--num-periods", "5", "--online-train-start", "2",
               "--online-test-start", "3", "--pre-model", pre,
               "--multi-num", "1", "--latent", "8", "--mf-sample", "alone",
               "--theta-warmstart", "50", "--snapshot-dtype", "bfloat16"])
    assert rc == 0
    out_text = capsys.readouterr().out
    summary = json.loads(out_text[out_text.index("{"):])
    assert "test_recall@5" in summary
    assert os.path.isdir(cache)
