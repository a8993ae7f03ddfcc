"""Native bundle checkpointing via Orbax (SURVEY.md §5 checkpoint/resume).

Once a checkpoint has been converted from safetensors (slow: key remapping +
transposes), `save_bundle` persists the Flax pytrees in Orbax's native format
for fast direct reload — the framework's own checkpoint story, which the
reference lacks entirely (it re-downloads/reloads HF pipelines every run).
"""

from __future__ import annotations

from pathlib import Path


def save_bundle(bundle, path: str) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "unet", bundle.unet_params)
        ckptr.save(path / "vae", bundle.vae_params)
        ckptr.save(path / "text", bundle.text_params)
        if bundle.text_params_2 is not None:
            ckptr.save(path / "text2", bundle.text_params_2)
    (path / "BUNDLE").write_text(bundle.config.name)


def load_bundle(bundle, path: str):
    """Restore params into a structurally-matching bundle (random_init first)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    name = (path / "BUNDLE").read_text().strip()
    if name != bundle.config.name:
        raise ValueError(f"checkpoint is for {name!r}, bundle is {bundle.config.name!r}")
    with ocp.StandardCheckpointer() as ckptr:
        bundle.unet_params = ckptr.restore(path / "unet", bundle.unet_params)
        bundle.vae_params = ckptr.restore(path / "vae", bundle.vae_params)
        bundle.text_params = ckptr.restore(path / "text", bundle.text_params)
        if bundle.text_params_2 is not None:
            if not (path / "text2").exists():
                # a silent skip here would leave RANDOM encoder-2 weights
                # in an SDXL bundle and produce garbage with no error
                raise FileNotFoundError(
                    f"checkpoint {path} has no text2/ but the bundle "
                    f"({name}) needs a second text encoder")
            bundle.text_params_2 = ckptr.restore(path / "text2", bundle.text_params_2)
    return bundle
