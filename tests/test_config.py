"""Experiment-config loader tests against the reference YAML schema."""

import textwrap

from egm_unet_tpu.config import ClipSegExperiment, load_experiments

YAML = textwrap.dedent("""
configuration:
  batch_size: 64
  lr: 0.001
  lr_scheduler: cosine
  T_max: 20000
  eta_min: 0.0001
  max_iterations: 20000
  image_size: 352
  reduce_dim: 64
  extract_layers: [3, 7, 9]
  prompt: shuffle+
  mask: text_and_crop_blur_highlight352
  loss: torch.nn.functional.binary_cross_entropy_with_logits
  amp: True

individual_configurations:
- {name: rd64-uni, version: 'ViT-B/16', reduce_dim: 64, with_visual: True,
   negative_prob: 0.2, mix: True, mix_text_max: 0.5}
- {name: rd64-uni-refined, version: 'ViT-B/16', reduce_dim: 64,
   negative_prob: 0.2, complex_trans_conv: True, with_visual: True,
   mix: True, mix_text_max: 0.5, T_max: 50000, max_iterations: 50000}
""")


def test_load_reference_schema(tmp_path):
    p = tmp_path / "phrasecut.yaml"
    p.write_text(YAML)
    runs = load_experiments(str(p))
    assert set(runs) == {"rd64-uni", "rd64-uni-refined"}

    uni = runs["rd64-uni"]
    assert uni.batch_size == 64 and uni.lr == 1e-3 and uni.t_max == 20000
    assert uni.negative_prob == 0.2 and uni.with_visual and uni.mix
    assert uni.extract_layers == (3, 7, 9)
    assert not uni.complex_trans_conv

    ref = runs["rd64-uni-refined"]
    assert ref.complex_trans_conv and ref.t_max == 50000


def test_build_from_experiment(tmp_path):
    import jax

    from egm_unet_tpu.config import build_from_experiment

    cfg = ClipSegExperiment(reduce_dim=16, extract_layers=(3, 7, 9),
                            batch_size=1, image_size=352)
    model, create_state = build_from_experiment(cfg)
    assert model.reduce_dim == 16
    assert model.extract_layers == (3, 7, 9)
