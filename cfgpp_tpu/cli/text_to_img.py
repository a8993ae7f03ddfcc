"""Text-to-image CLI.

Parity surface with `examples/text_to_img.py` (same flags, same output path
`<workdir>/result/generated.png`), plus --ckpt_dir / --resolution / --dtype.
Run: ``python -m cfgpp_tpu.cli.text_to_img --model sd15 --method ddim_cfg++
--cfg_guidance 0.6 --prompt "..."``.

Differences from the reference (documented quirk fixes, SURVEY.md §7):
* ``--model sd20`` actually selects an SD-2.x architecture instead of
  silently running SD-1.5 (examples/text_to_img.py:21,47-50).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from cfgpp_tpu.cli.common import add_common_args, build_engine, maybe_profile
from cfgpp_tpu.engine.callbacks import ComposeCallback
from cfgpp_tpu.utils import create_workdir, save_image


def main(argv=None):
    parser = argparse.ArgumentParser(description="cfgpp_tpu text-to-image")
    add_common_args(parser, default_method="ddim", default_nfe=50)
    parser.add_argument("--callbacks", type=str, nargs="*", default=None,
                        help="e.g. draw_noisy draw_tweedie")
    parser.add_argument("--callback_frequency", type=int, default=1)
    parser.add_argument("--prompt_2", type=str, default=None,
                        help="SDXL second-encoder prompt (defaults to --prompt)")
    parser.add_argument("--null_prompt_2", type=str, default=None)
    parser.add_argument("--clip_skip", type=int, default=None)
    args = parser.parse_args(argv)

    workdir = Path(args.workdir or "workdir/t2i")
    create_workdir(workdir)

    callback = None
    if args.callbacks:
        callback = ComposeCallback(workdir=workdir, callbacks=args.callbacks,
                                   frequency=args.callback_frequency)

    engine = build_engine(args)
    prompt_2 = None
    if args.prompt_2 is not None or args.null_prompt_2 is not None:
        prompt_2 = [args.null_prompt_2 if args.null_prompt_2 is not None
                    else args.null_prompt,
                    args.prompt_2 if args.prompt_2 is not None else args.prompt]
    with maybe_profile(args):
        result = engine.sample(
            prompt=[args.null_prompt, args.prompt],
            prompt_2=prompt_2,
            cfg_guidance=args.cfg_guidance,
            seed=args.seed,
            resolution=args.resolution,
            callback_fn=callback,
            clip_skip=args.clip_skip,
        )
    out = workdir / "result" / "generated.png"
    save_image(result, out, normalize_img=True)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
