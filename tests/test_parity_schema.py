"""Dump-schema round-trip: the reference-trajectory dump format stays in
sync with the parity_check CLI that consumes it.

The real gate (per-step MAE < 1e-2 vs diffusers,
/root/reference/latent_diffusion.py:653-674) is environment-blocked — no
diffusers/weights here — so what CAN be enforced locally is that
`tools/dump_reference_traj.py` and `cfgpp_tpu.cli.parity_check` agree on
the .npz schema end-to-end:

* synthetic dumps with EXACTLY the `DUMP_SCHEMA` keys, produced from our
  own engine via a synthetic HF-layout checkpoint on disk, must run
  through ``parity_check.main(["--dump", ..., "--ckpt_dir", ...])`` and
  PASS at MAE ~ 0 for every kind (t2i / inversion / edit);
* the producer's source must mention every schema key (a rename on either
  side breaks this file).
"""

import json
import re
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from cfgpp_tpu.cli import parity_check
from cfgpp_tpu.cli.parity_check import DUMP_SCHEMA
from cfgpp_tpu.engine import DiffusionEngine, ModelBundle

pytestmark = pytest.mark.slow  # >60s-class integration module: run via the full suite (pytest tests/ -q); the default dev selection is -m "not slow" (see pyproject)

REPO = Path(__file__).resolve().parent.parent


def test_dump_tool_writes_schema_keys():
    """Static sync check on the producer: every DUMP_SCHEMA key must appear
    as a quoted literal in tools/dump_reference_traj.py."""
    src = (REPO / "tools" / "dump_reference_traj.py").read_text()
    all_keys = {k for keys in DUMP_SCHEMA.values() for k in keys}
    missing = [k for k in all_keys
               if not re.search(rf"[\"']{re.escape(k)}[\"']", src)]
    assert not missing, f"dump tool no longer writes keys: {missing}"
    # and the producer's out-dict doesn't grow keys the consumer ignores
    m = re.search(r"out = \{(.*?)\n    \}", src, re.S)
    assert m, "dump tool out-dict not found (refactor? update this test)"
    written = set(re.findall(r"[\"'](\w+)[\"']:", m.group(1)))
    assert written <= all_keys, (
        f"dump tool writes keys unknown to DUMP_SCHEMA: {written - all_keys}")


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    """Synthetic HF-layout checkpoint dir for tiny_sd, written with the
    independent flax->torch emitters from test_convert_roundtrip."""
    from safetensors.numpy import save_file

    from test_convert_roundtrip import _emit, _np_params

    bundle = ModelBundle.random_init("tiny_sd", dtype=jnp.float32,
                                     param_dtype=jnp.float32)
    root = tmp_path_factory.mktemp("ckpt")
    unet_state = _emit(_np_params(bundle.unet_params)["params"])
    vae_state = _emit(_np_params(bundle.vae_params)["params"])
    text = _np_params(bundle.text_params)["params"]
    text_state = {}
    for k, v in text.items():
        if k == "token_embedding":
            text_state["text_model.embeddings.token_embedding.weight"] = \
                np.asarray(v["embedding"])
        elif k == "position_embedding":
            text_state["text_model.embeddings.position_embedding.weight"] = \
                np.asarray(v)
        elif k == "final_layer_norm":
            text_state["text_model.final_layer_norm.weight"] = np.asarray(v["scale"])
            text_state["text_model.final_layer_norm.bias"] = np.asarray(v["bias"])
        else:
            text_state.update(_emit({k: v}, "text_model.encoder."))
    for sub, state in (("unet", unet_state), ("vae", vae_state),
                       ("text_encoder", text_state)):
        (root / sub).mkdir()
        save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
                  str(root / sub / "model.safetensors"))
    return root


@pytest.fixture(scope="module")
def engine(ckpt_dir):
    bundle = ModelBundle.from_pretrained(str(ckpt_dir), "tiny_sd",
                                         dtype=jnp.float32,
                                         param_dtype=jnp.float32)
    return DiffusionEngine(bundle, solver="ddim_cfg++", nfe=3)


def _base_dump(z0s, zts, zT, method, kind, nfe):
    return {
        "zT": np.asarray(zT, np.float32),
        "z0t": np.asarray(z0s, np.float32), "zt": np.asarray(zts, np.float32),
        "prompt": "a cat", "null_prompt": "", "cfg_guidance": 0.6,
        "nfe": nfe, "method": method, "model": "tiny_sd", "kind": kind,
        "seed": 42,
    }


def _run_main(tmp_path, dump, name):
    path = tmp_path / name
    np.savez_compressed(path, **dump)
    rc = parity_check.main(["--dump", str(path), "--ckpt_dir",
                            str(dump.pop("_ckpt")), "--dtype", "float32"])
    return rc


def test_t2i_dump_roundtrip(tmp_path, ckpt_dir, engine, capsys):
    zT = np.random.RandomState(0).randn(1, 8, 8, 4).astype(np.float32)
    _, (z0s, zts) = engine.sample(["", "a cat"], cfg_guidance=0.6,
                                  resolution=16, init_latent_override=zT,
                                  return_trajectory=True)
    dump = _base_dump(z0s, zts, zT, "ddim_cfg++", "t2i", 3)
    assert set(dump) == set(DUMP_SCHEMA["t2i"])
    dump["_ckpt"] = ckpt_dir
    assert _run_main(tmp_path, dump, "t2i.npz") == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["verdict"] == "PASS" and out["worst_mae"] < 1e-6


def test_inversion_dump_roundtrip(tmp_path, ckpt_dir, engine, capsys):
    eng = DiffusionEngine(engine.bundle, solver="ddim_inversion_cfg++", nfe=2)
    src_latent = np.random.RandomState(1).randn(1, 8, 8, 4).astype(np.float32)
    dummy = np.zeros((1, 16, 16, 3), np.float32)
    _, (z0s, zts) = eng.sample(["", "a cat"], cfg_guidance=0.6, resolution=16,
                               src_img=dummy, src_latent_override=src_latent,
                               return_trajectory=True)
    dump = _base_dump(z0s, zts, src_latent, "ddim_inversion_cfg++",
                      "inversion", 2)
    dump["src_latent"] = src_latent
    assert set(dump) == set(DUMP_SCHEMA["inversion"])
    dump["_ckpt"] = ckpt_dir
    assert _run_main(tmp_path, dump, "inv.npz") == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["verdict"] == "PASS"


def test_edit_dump_roundtrip(tmp_path, ckpt_dir, engine, capsys):
    eng = DiffusionEngine(engine.bundle, solver="ddim_edit_cfg++", nfe=2)
    src_latent = np.random.RandomState(2).randn(1, 8, 8, 4).astype(np.float32)
    dummy = np.zeros((1, 16, 16, 3), np.float32)
    _, (z0s, zts) = eng.sample(["", "a cat", "a dog"], cfg_guidance=0.6,
                               resolution=16, src_img=dummy,
                               src_latent_override=src_latent,
                               return_trajectory=True)
    dump = _base_dump(z0s, zts, src_latent, "ddim_edit_cfg++", "edit", 2)
    dump["prompt"] = "a dog"          # edit target (word-swap)
    dump["src_latent"] = src_latent
    dump["src_prompt"] = "a cat"
    assert set(dump) == set(DUMP_SCHEMA["edit"])
    dump["_ckpt"] = ckpt_dir
    assert _run_main(tmp_path, dump, "edit.npz") == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["verdict"] == "PASS"


def test_divergent_dump_fails(tmp_path, ckpt_dir, engine, capsys):
    """A corrupted trajectory must FAIL the gate (the harness is not a
    rubber stamp)."""
    zT = np.random.RandomState(3).randn(1, 8, 8, 4).astype(np.float32)
    _, (z0s, zts) = engine.sample(["", "a cat"], cfg_guidance=0.6,
                                  resolution=16, init_latent_override=zT,
                                  return_trajectory=True)
    dump = _base_dump(np.asarray(z0s) + 0.5, zts, zT, "ddim_cfg++", "t2i", 3)
    dump["_ckpt"] = ckpt_dir
    assert _run_main(tmp_path, dump, "bad.npz") == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["verdict"] == "FAIL"
