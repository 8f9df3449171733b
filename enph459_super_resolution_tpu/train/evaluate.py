"""Standalone neural-SR evaluation CLI.

Restores a checkpoint produced by ``train.loop`` and reports PSNR/SSIM
(Y channel, border shave = scale — the Set5/Set14 protocol) against the
bicubic baseline over a directory of HR images (or the hermetic synthetic
pool when no directory is given).

The full protocol is oracle-pinned (tests/test_matlab_imresize_oracle.py):
the bicubic degradation/baseline is MATLAB ``imresize`` semantics verified
entry-for-entry (edges included) against an independent loop-level
reimplementation of the published algorithm, and the BT.601 Y-channel +
shave chain is checked against hand-computed values — so
``--data-dir Set5`` produces literature-comparable numbers as-is.

  python -m enph459_super_resolution_tpu.train.evaluate \
      --model espcn --scale 2 --channels 1 --run /tmp/sr_train \
      [--data-dir Set5] [--ema/--raw] \
      [--interp-run /tmp/sr_gan --alpha 0.8]

``--interp-run`` evaluates the ESRGAN *network interpolation* (Wang et
al. 2018 §3.4, the recipe behind BASELINE config #4): blend the
PSNR-oriented pretrain (``--run``) with the adversarial fine-tune
(``--interp-run``) in parameter space, θ = (1−α)·θ_PSNR + α·θ_GAN, to
trade distortion against perceptual quality without retraining.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def load_run_weights(run_dir, raw=False):
    """Restore (weights, step) from a train.loop run dir — plain
    TrainState or GAN fine-tune (generator under 'g'), EMA by default."""
    import jax
    import numpy as np

    from .state import restore_checkpoint_numpy

    tree, step = restore_checkpoint_numpy(
        os.path.join(run_dir, "ckpt"))
    if "g" in tree:
        tree = tree["g"]
    weights = tree["params"] if raw else tree["ema_params"]
    return jax.tree.map(np.asarray, weights), int(step)


def interpolate_weights(psnr_weights, gan_weights, alpha):
    """ESRGAN network interpolation: (1−α)·θ_PSNR + α·θ_GAN, leafwise."""
    import jax

    a = float(alpha)
    return jax.tree.map(lambda p, g: (1.0 - a) * p + a * g,
                        psnr_weights, gan_weights)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default=None,
                   choices=["srcnn", "espcn", "fsrcnn", "edsr", "rrdbnet"],
                   help="(default: the run's recorded model, else edsr)")
    p.add_argument("--scale", type=int, default=None,
                   help="(default: the run's recorded scale, else 4)")
    p.add_argument("--channels", type=int, default=None,
                   help="(default: the run's recorded channels, else 3)")
    p.add_argument("--run", required=True,
                   help="training output dir containing ckpt/")
    p.add_argument("--data-dir", default=None,
                   help="directory of HR evaluation images")
    p.add_argument("--raw", action="store_true",
                   help="evaluate raw params instead of EMA weights")
    p.add_argument("--tiled", action="store_true",
                   help="use exact tiled inference (large images)")
    p.add_argument("--model-kwargs", default=None,
                   help="JSON dict of extra model constructor kwargs — must "
                        "match the training run (e.g. '{\"nb\": 8}')")
    p.add_argument("--interp-run", default=None,
                   help="GAN fine-tune run dir: evaluate the ESRGAN network "
                        "interpolation (1−α)·run + α·interp-run")
    p.add_argument("--alpha", type=float, default=0.8,
                   help="interpolation weight on --interp-run (ESRGAN paper "
                        "default 0.8)")
    p.add_argument("--pool", default="synthetic",
                   choices=["synthetic", "natural", "edges"],
                   help="procedural eval pool when no --data-dir is given "
                        "(match the training run's --pool)")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import numpy as np

    from ..models import create_model
    from .data import POOL_KINDS, evaluate_sr, image_pool_from_dir

    # the run's recorded config (train.loop config.json) is the default
    # for everything model-shaped — it carries kwargs the trainer
    # injected (e.g. the scan_trunk=True layout a pp mesh uses); explicit
    # flags and --model-kwargs still win
    run_cfg = {}
    run_cfg_path = os.path.join(args.run, "config.json")
    if os.path.exists(run_cfg_path):
        with open(run_cfg_path) as fp:
            run_cfg = json.load(fp)
    args.model = args.model or run_cfg.get("model", "edsr")
    args.scale = (args.scale if args.scale is not None
                  else int(run_cfg.get("scale", 4)))
    args.channels = (args.channels if args.channels is not None
                     else int(run_cfg.get("channels", 3)))
    kwargs = {"channels": args.channels}
    if args.model != "srcnn":
        kwargs["scale"] = args.scale
    recorded = dict(run_cfg.get("model_kwargs") or {})
    # channels/scale were resolved above (explicit flag > run config);
    # the recorded copies must not override an explicit flag
    recorded.pop("channels", None)
    recorded.pop("scale", None)
    kwargs.update(recorded)
    if args.model_kwargs:
        kwargs.update(json.loads(args.model_kwargs))
    model = create_model(args.model, **kwargs)

    make_pool = POOL_KINDS[args.pool]
    pool = (image_pool_from_dir(args.data_dir, channels=args.channels)
            if args.data_dir else
            make_pool(n_images=8, channels=args.channels))

    # template state for orbax restore
    lr0 = np.zeros((1, 16, 16, args.channels), np.float32)
    if args.model == "srcnn":
        from ..ops.resize import bicubic_upsample

        def apply_fn(params, lr):
            return model.apply(params, bicubic_upsample(lr, args.scale))
        init_in = np.zeros((1, 16 * args.scale, 16 * args.scale,
                            args.channels), np.float32)
    else:
        apply_fn = model.apply
        init_in = lr0
    # sanity: the kwargs build a net (tracing only; a real init would
    # materialize every parameter on the device just to throw it away)
    jax.eval_shape(model.init, jax.random.PRNGKey(0), init_in)

    try:
        weights, step = load_run_weights(args.run, raw=args.raw)
        if args.interp_run:
            gan_weights, _ = load_run_weights(args.interp_run, raw=args.raw)
            weights = interpolate_weights(weights, gan_weights, args.alpha)
    except FileNotFoundError as e:
        print(e, file=sys.stderr)
        return 1

    if args.tiled:
        from ..models.infer import tiled_infer

        if args.model == "srcnn":
            # SRCNN runs at HR resolution on a bicubic pre-upsample; tile
            # the scale-1 trunk over the upsampled image
            from ..ops.resize import bicubic_upsample

            def run(params, lr):
                up = np.asarray(bicubic_upsample(lr, args.scale))
                return tiled_infer(model, params, up, scale=1)
        else:
            def run(params, lr):
                return tiled_infer(model, params, np.asarray(lr))
    else:
        run = apply_fn

    metrics = evaluate_sr(run, weights, pool, args.scale)
    metrics.update(step=int(step), model=args.model, scale=args.scale,
                   weights="raw" if args.raw else "ema")
    if args.interp_run:
        metrics.update(alpha=args.alpha, interp_run=args.interp_run)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
