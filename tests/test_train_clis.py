"""Smoke tests for the CLIP training CLIs (synthetic data, tiny towers)."""

import os

import numpy as np


def test_train_clipseg_cli(tmp_path, capsys):
    from egm_unet_tpu.cli.train_clipseg import main

    save = str(tmp_path / "ckpt")
    main(["--synthetic", "--tiny-clip", "--image-size", "64",
          "--batch-size", "4", "--epochs", "2", "--steps", "20",
          "--save-dir", save])
    out = capsys.readouterr().out
    losses = [float(ln.split("loss ")[1].split()[0])
              for ln in out.splitlines() if "loss " in ln]
    assert len(losses) >= 2 and losses[-1] < losses[0]
    assert os.path.isdir(save) and "meta.json" in os.listdir(save)


def test_train_longclip_cli(tmp_path, capsys):
    from egm_unet_tpu.cli.train_longclip import main

    save = str(tmp_path / "ckpt")
    main(["--synthetic", "--tiny-clip", "--batch-size", "16", "--steps", "12",
          "--warmup-steps", "2", "--lr", "1e-3", "--print-freq", "4",
          "--save-every", "12", "--save-dir", save])
    out = capsys.readouterr().out
    losses = [float(ln.split("loss ")[1].split()[0])
              for ln in out.splitlines() if "loss " in ln]
    assert len(losses) >= 3 and losses[-1] < losses[0]
    assert os.path.isdir(save) and os.listdir(save)
