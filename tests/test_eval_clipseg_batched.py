"""Batched fusion-eval pipeline: O(buckets) device dispatches instead of the
reference's per-image loop (ref: eval_CLIPseg.py:855-891).

At the shipping defaults (clip_batch 32, unet_batch 16), 100 val images with
2 prompts cost ceil(200/32) + ceil(100/16) = 7 + 7 = 14 model dispatches.
"""

import os

import numpy as np
import pytest

from egm_unet_tpu.cli.eval_clipseg import main, run_in_chunks


def test_run_in_chunks_dispatch_count_and_padding():
    calls = []

    def forward(x, c):
        calls.append(x.shape)
        return np.asarray(x).sum(axis=(1, 2, 3)) + np.asarray(c).sum(axis=1)

    n = 13
    xs = np.arange(n * 2 * 2 * 3, dtype=np.float32).reshape(n, 2, 2, 3)
    cs = np.ones((n, 4), np.float32)
    out = run_in_chunks(forward, (xs, cs), batch_size=4)
    assert len(calls) == 4  # ceil(13/4)
    assert all(s == (4, 2, 2, 3) for s in calls)  # ONE compiled shape
    assert out.shape == (n,)
    np.testing.assert_allclose(out, xs.sum(axis=(1, 2, 3)) + 4.0)


def test_eval_clipseg_cli_end_to_end(tmp_path):
    alpha_file = str(tmp_path / "alpha.txt")
    out_dir = str(tmp_path / "masks")
    main(["--synthetic", "--tiny-clip", "--base-c", "8", "--clip-size", "64",
          "--base-size", "96", "--clip-batch", "8", "--unet-batch", "8",
          "--alpha-file", alpha_file, "--save-result", out_dir])
    alpha = float(open(alpha_file).read())
    assert 0.1 <= alpha <= 10.0  # the reference's grid (eval_CLIPseg.py:676)
    masks = sorted(os.listdir(out_dir))
    assert len(masks) == 8
    from PIL import Image

    arr = np.asarray(Image.open(os.path.join(out_dir, masks[0])))
    assert set(np.unique(arr)) <= {0, 255}  # {1 -> 255} color map


def test_predict_clipseg_cli_end_to_end(tmp_path):
    from egm_unet_tpu.cli.predict_clipseg import main as predict_main

    alpha_file = str(tmp_path / "alpha.txt")
    open(alpha_file, "w").write("2.5\n")
    out_dir = str(tmp_path / "fusion")
    predict_main(["--synthetic", "--tiny-clip", "--base-c", "8",
                  "--clip-size", "64", "--base-size", "96",
                  "--clip-batch", "4", "--unet-batch", "4",
                  "--alpha-file", alpha_file, "--save-result", out_dir])
    assert len(os.listdir(out_dir)) == 4
