#!/usr/bin/env python
"""Stream frames through the transfer net and encode a video.

Parity with the reference's ``predict_video_using_checkpoint.py``: style params are
computed ONCE and stay resident on device; each frame runs only the jitted transfer
net.  Encoding uses an ffmpeg subprocess when available (the reference used
moviepy/ffmpeg); otherwise frames are written as a PNG sequence.

    python predict_video_using_checkpoint.py -C logs/<run> -s style.jpg \
        --frames_dir data/screenshots/hdr_images/validation -o out/video.mp4
"""

from __future__ import annotations

import argparse
import logging
import shutil
import subprocess
from pathlib import Path

import numpy as np

from realtime_style_transfer_tpu import cli
from realtime_style_transfer_tpu.tracing import logsetup

log = logging.getLogger("predict_video")


def _positive_int(s):
    v = int(s)
    if v < 1:
        raise argparse.ArgumentTypeError("must be >= 1")
    return v


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    cli.add_config_args(p)
    p.add_argument("-C", "--checkpoint_path", type=Path, required=True)
    p.add_argument("-s", "--style", type=Path, action="append", required=True,
                   help="style image (repeat for dual-style blending)")
    p.add_argument("-w", "--style_weights", type=Path, default=None,
                   help="grayscale weight-map image for style 2 (static "
                        "across frames; zeros when omitted)")
    p.add_argument("--frames_dir", type=Path, required=True,
                   help="directory of frame PNGs (+ EXR siblings when HDR)")
    p.add_argument("-o", "--output", type=Path, default=Path("out/video.mp4"))
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--bitrate", type=str, default="7M")
    p.add_argument("--profile_dir", type=Path, default=None,
                   help="capture a jax.profiler trace of the frame loop")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument(
        "--path", choices=("auto", "fused", "packed", "standard"),
        default="auto",
        help="compute path: 'fused' = whole-net Pallas kernel (fastest; "
             "flagship-family configs, 1-2 styles, TPU), 'packed' = "
             "packed-layout XLA, 'standard' = the flax module; 'auto' picks "
             "fused when the config qualifies on TPU",
    )
    p.add_argument(
        "--packed", action="store_true", help="alias for --path packed",
    )
    p.add_argument(
        "--quant", choices=("none", "int8"), default="none",
        help="deploy quantization of the fused kernel: 'int8' calibrates "
             "per-channel activation scales on the first frames (see "
             "--calibration_frames) with the CURRENT styles, then streams "
             "through the int8 engine (int8 MXU matmuls, f32 dequant "
             "epilogue).  Requires the fused path; scales are style-"
             "specific, so re-run per style selection",
    )
    p.add_argument(
        "--calibration_frames", type=_positive_int, default=4, metavar="N",
        help="frames used to calibrate --quant int8 activation scales "
             "(they are still stylized and written to the output)",
    )
    p.add_argument(
        "--scales", type=Path, default=None,
        help="load --quant int8 activation scales from this file instead of "
             "calibrating (must come from --scales_out with the SAME "
             "checkpoint and style selection — the file carries a "
             "provenance fingerprint and a mismatch is refused without "
             "--force_scales; loaded scales are saturation-checked on the "
             "first --calibration_frames frames either way)",
    )
    p.add_argument(
        "--scales_out", type=Path, default=None,
        help="save the calibrated --quant int8 scales (npz with a "
             "(checkpoint, style) provenance fingerprint) for reuse via "
             "--scales (skips startup calibration on restarts)",
    )
    p.add_argument(
        "--force_scales", action="store_true",
        help="deploy a --scales file whose provenance fingerprint does not "
             "match the current (checkpoint, style) selection anyway "
             "(mismatched scales can saturate the int8 clip and silently "
             "degrade output; the saturation check still runs and warns)",
    )
    p.add_argument(
        "--data_parallel", type=int, default=1, metavar="N",
        help="shard the frame stream over an N-chip data mesh (one frame per "
             "chip per step via shard_map; the fused kernel is the per-chip "
             "program where the plan qualifies — parallel/infer."
             "FusedStreamStylizer)",
    )
    return p.parse_args()


class VideoSink:
    """ffmpeg pipe when available; PNG sequence fallback."""

    def __init__(self, output: Path, fps: int, bitrate: str, size_hw):
        self.output = output
        output.parent.mkdir(parents=True, exist_ok=True)
        self.ffmpeg = shutil.which("ffmpeg")
        self.proc = None
        self.frame_index = 0
        if self.ffmpeg:
            h, w = size_hw
            self.proc = subprocess.Popen(
                [
                    self.ffmpeg, "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
                    "-s", f"{w}x{h}", "-r", str(fps), "-i", "-",
                    "-b:v", bitrate, "-pix_fmt", "yuv420p", str(output),
                ],
                stdin=subprocess.PIPE,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        else:
            log.warning("ffmpeg not found: writing PNG sequence next to %s", output)
            self.frames_dir = output.with_suffix("")
            self.frames_dir.mkdir(parents=True, exist_ok=True)

    def write(self, frame01: np.ndarray) -> None:
        from realtime_style_transfer_tpu.data.imaging import image_to_uint8

        rgb = image_to_uint8(frame01)
        if self.proc is not None:
            self.proc.stdin.write(rgb.tobytes())
        else:
            import PIL.Image

            PIL.Image.fromarray(rgb).save(
                self.frames_dir / f"frame_{self.frame_index:06d}.png"
            )
        self.frame_index += 1

    def close(self) -> None:
        if self.proc is not None:
            self.proc.stdin.close()
            self.proc.wait()
            log.info("wrote %s (%d frames)", self.output, self.frame_index)
        else:
            log.info("wrote %d frames to %s", self.frame_index, self.frames_dir)


def _take_calibration_frames(frames, n):
    """Materialize the first ``n`` frames for int8 calibration and return
    them plus a stream that replays them before the rest (calibration
    frames are still stylized and written)."""
    import itertools

    cal = []
    for frame in frames:
        cal.append(frame)
        if len(cal) >= n:
            break
    if not cal:
        raise SystemExit("no frames found to calibrate --quant int8 on")
    return cal, itertools.chain(iter(cal), frames)


def _calibrate_scales(engine, frames, n, style_params, weights,
                      prepared=None):
    """Calibrate int8 activation scales on the bf16 ``engine`` with the
    stream's first ``n`` frames.  Returns (scales, replayed_stream, n_used)."""
    import jax.numpy as jnp

    cal, frames = _take_calibration_frames(frames, n)
    packed = [jnp.asarray(engine.pack_frame_np(f[None])) for f in cal]
    if prepared is None:
        prepared = engine.prepare_style(style_params, weights)
    return engine.calibrate_act_scales(packed, prepared), frames, len(cal)


def _check_loaded_scales(args, engine, frames, scales, prepared):
    """Saturation-check --scales against the first deploy frames; warn when
    the int8 engine would clip meaningfully under them."""
    import jax.numpy as jnp

    cal, frames = _take_calibration_frames(frames, args.calibration_frames)
    packed = [jnp.asarray(engine.pack_frame_np(f[None])) for f in cal]
    report = engine.check_act_saturation(packed, prepared, scales)
    worst = max(report, key=lambda r: r["max_ratio"])
    clips = sum(r["clip_events"] for r in report)
    total = sum(r["n_quantized"] for r in report)
    frac = clips / max(total, 1)
    if worst["max_ratio"] > 1.25 or frac > 1e-3:
        log.warning(
            "int8 scales SATURATE on these frames (worst stage %s: "
            "max|x|/scale = %.2f; %.4f%% of quantize events clip at "
            "+-127 across %d frames) — output quality will degrade; "
            "recalibrate with the deployed (checkpoint, style) selection",
            worst["stage"], worst["max_ratio"], 100.0 * frac, len(cal))
    else:
        log.info(
            "int8 scale saturation check ok on %d frames (worst stage %s: "
            "max|x|/scale = %.2f, clip fraction %.2e)",
            len(cal), worst["stage"], worst["max_ratio"], frac)
    return frames


def _get_scales(args, engine, frames, style_params, weights, variables,
                prepared=None):
    """int8 scales: load from --scales (fingerprint-verified + saturation-
    checked), else calibrate (and maybe save with provenance)."""
    from realtime_style_transfer_tpu.ops.pallas.fused_transfer import (
        load_act_scales, save_act_scales, scales_fingerprint,
    )

    if prepared is None:
        prepared = engine.prepare_style(style_params, weights)
    # fingerprinting sha256s a device_get of every checkpoint leaf — only
    # pay for it when a scales file is being verified or written
    if args.scales is not None or args.scales_out is not None:
        fingerprint = scales_fingerprint(variables, style_params, weights)
    if args.scales is not None:
        scales, file_fp = load_act_scales(args.scales)
        if file_fp is not None and file_fp != fingerprint:
            if not args.force_scales:
                raise SystemExit(
                    f"--scales {args.scales} was calibrated against a "
                    "DIFFERENT (checkpoint, style) selection than the one "
                    "being deployed — mismatched scales can saturate the "
                    "int8 clip and silently degrade output.  Recalibrate "
                    "(drop --scales), or pass --force_scales to deploy "
                    "them anyway.")
            log.warning(
                "--scales fingerprint mismatch overridden by --force_scales")
        elif file_fp is None:
            log.warning(
                "--scales %s has no provenance fingerprint (legacy .npy); "
                "cannot verify it matches this (checkpoint, style) — "
                "running the saturation check", args.scales)
        log.info("loaded int8 scales from %s", args.scales)
        frames = _check_loaded_scales(args, engine, frames, scales, prepared)
        return scales, frames
    scales, frames, n_cal = _calibrate_scales(
        engine, frames, args.calibration_frames, style_params, weights,
        prepared)
    log.info("int8 engine calibrated on %d frames", n_cal)
    if args.scales_out is not None:
        args.scales_out.parent.mkdir(parents=True, exist_ok=True)
        save_act_scales(args.scales_out, np.asarray(scales), fingerprint)
        log.info("saved int8 scales to %s", args.scales_out)
    return scales, frames


def main():
    args = parse_args()
    logsetup.setup()

    import jax
    import jax.numpy as jnp

    from realtime_style_transfer_tpu.data.hdr_screenshots import (
        find_screenshots, iter_hdr_screenshots,
    )
    from realtime_style_transfer_tpu.data.imaging import list_image_paths, load_image
    from realtime_style_transfer_tpu.data.pipeline import DevicePrefetcher
    from realtime_style_transfer_tpu.tracing.profiler import FrameTimer, trace

    config = cli.config_from_args(args, num_styles=len(args.style))
    model, variables = cli.build_inference(config, dtype=cli.compute_dtype(args))
    variables = cli.load_variables(args.checkpoint_path, variables)

    # Style params once (reference :77-80), resident on device.
    style = cli.load_styles(args.style, config)[None]
    style_params = jax.jit(
        lambda v, s: model.apply(v, s, method=model.predict_style_params)
    )(variables, jnp.asarray(style))

    # Static per-pixel weight map for dual-style streaming (framework
    # extension; the reference video loop is single-style).
    weights = None
    if config.num_styles == 1 and args.style_weights is not None:
        raise SystemExit(
            "-w/--style_weights needs at least two -s styles to blend"
        )
    if config.num_styles > 1:
        if args.style_weights is not None:
            wm = load_image(
                args.style_weights,
                config.output_dimensions + (config.num_styles - 1,),
            )
        else:
            wm = np.zeros(config.style_weights_shape, np.float32)
        weights = jnp.asarray(wm[None])

    from realtime_style_transfer_tpu.models.inference import plan_from_config

    plan = plan_from_config(config)
    dp = max(1, args.data_parallel)
    path = "packed" if args.packed else args.path
    if dp > 1:
        # Frames over an N-chip data mesh; the fused kernel (or packed path)
        # is the per-chip program.  One frame per chip per step.
        from jax.sharding import NamedSharding, PartitionSpec

        from realtime_style_transfer_tpu.parallel import make_mesh
        from realtime_style_transfer_tpu.parallel.infer import (
            FusedStreamStylizer,
        )

        if path == "standard":
            raise SystemExit(
                "--data_parallel streams through the fused/packed per-chip "
                "paths; use --path auto, fused or packed")
        mesh = make_mesh(dp, spatial=1)
        streamer = FusedStreamStylizer(
            variables, plan, mesh, num_styles=config.num_styles, path=path,
            interpret=jax.devices()[0].platform == "cpu",
            dtype=cli.compute_dtype(args))
        log.info("data-parallel mesh: %s chips, per-chip path: %s",
                 dp, streamer.path)
        batch_sharding = NamedSharding(mesh, PartitionSpec("data"))

        if config.hdr and config.total_channels > 3:
            pngs = find_screenshots(args.frames_dir)
            frames = iter_hdr_screenshots(
                pngs, config.channels, config.content_shape)
        else:
            paths = list_image_paths(args.frames_dir)
            frames = (load_image(p, config.content_shape) for p in paths)

        if args.quant == "int8":
            if streamer.path != "fused":
                raise SystemExit(
                    "--quant int8 requires the fused path; this config/mesh "
                    "fell back to 'packed' (pass --path fused on a "
                    "fused-family config)")
            # calibrate single-chip on the streamer's own bf16 per-chip
            # engine (scales are mesh-independent: same kernel per chip)
            scales, frames = _get_scales(
                args, streamer.fused_engine, frames, style_params, weights,
                variables)
            streamer = FusedStreamStylizer(
                variables, plan, mesh, num_styles=config.num_styles,
                path="fused", interpret=streamer.fused_engine.interpret,
                dtype=cli.compute_dtype(args),
                quant="int8", act_scales=scales)
        prepared = streamer.prepare_style(style_params, weights)

        def grouped_frames():
            group, n_real = [], 0
            for i, frame in enumerate(frames):
                if args.max_frames is not None and i >= args.max_frames:
                    break
                group.append(frame)
                if len(group) == dp:
                    yield np.stack(group), dp
                    group = []
            if group:
                n_real = len(group)
                while len(group) < dp:  # pad the tail; extras dropped on write
                    group.append(group[-1])
                yield np.stack(group), n_real

        sink = VideoSink(args.output, args.fps, args.bitrate,
                         config.output_dimensions)
        # Fused per-chip path: pre-pack frame groups on the host (deploy
        # input contract, same as single-chip --path fused).
        if streamer.path == "fused":
            group_prep = streamer.pack_frames_np
            stylize_group = streamer.stylize_batch_prepacked
        else:
            group_prep = lambda g: g  # noqa: E731
            stylize_group = streamer.stylize_batch
        warm = group_prep(np.zeros((dp,) + config.content_shape, np.float32))
        jax.device_get(stylize_group(jax.device_put(warm, batch_sharding),
                                     prepared))
        timer = FrameTimer()
        with trace(str(args.profile_dir) if args.profile_dir else None):
            for content, n_real in DevicePrefetcher(
                grouped_frames(), depth=3,
                device_put=lambda item: (
                    jax.device_put(group_prep(item[0]), batch_sharding),
                    item[1]),
            ):
                with timer.frame():
                    out = stylize_group(content, prepared)
                    batch = np.asarray(jax.device_get(out))
                for frame in batch[:n_real]:
                    sink.write(frame)
        sink.close()
        stats = timer.percentiles()
        log.info("step latency (%d frames/step): %s", dp,
                 {k: round(v, 3) for k, v in stats.items()})
        return

    if path == "auto":
        fused_ok = (
            (plan.num_contract_blocks, plan.num_expand_blocks) in
            ((2, 2), (3, 3))
            and (plan.input_shape[1] // (4 * plan.num_contract_blocks - 4))
            % 8 == 0
            and plan.bottleneck_num_filters <= 128
            and config.num_styles <= (1 if plan.num_contract_blocks == 3
                                      else 2)
            and jax.devices()[0].platform not in ("cpu",)
        )
        path = "fused" if fused_ok else "packed"
        log.info("compute path: %s", path)
    if path == "fused":
        from realtime_style_transfer_tpu.ops.pallas.fused_transfer import (
            FusedTransfer,
        )

        fused = FusedTransfer(jax.device_get(variables), plan,
                              num_styles=config.num_styles,
                              interpret=jax.devices()[0].platform == "cpu")
        # Style table + weight mips are loop-invariant: build them once and
        # skip the per-frame rebuild (reference :77-80 precomputes the same).
        prepared = fused.prepare_style(style_params, weights)
        # Deploy input contract: the s2d-f4 pack happens on the HOST in the
        # DevicePrefetcher worker (bit-identical to the device pack, tested),
        # so the per-frame device graph is pack-free — ~0.15 ms/frame saved.
        preprocess = fused.pack_frame_np
        stylize = lambda v, c, p: fused.stylize_prepacked(c, prepared)  # noqa: E731
    elif path == "packed":
        from realtime_style_transfer_tpu.models.transfer_packed import (
            stylize_packed,
        )

        dtype = cli.compute_dtype(args)
        preprocess = None
        stylize = jax.jit(
            lambda v, c, p: stylize_packed(v, c, p, weights, plan=plan,
                                           dtype=dtype)
        )
    else:
        preprocess = None
        stylize = jax.jit(
            lambda v, c, p: model.apply(v, c, p, weights,
                                        method=model.stylize)
        )

    if config.hdr and config.total_channels > 3:
        pngs = find_screenshots(args.frames_dir)
        frames = iter_hdr_screenshots(pngs, config.channels, config.content_shape)
    else:
        paths = list_image_paths(args.frames_dir)
        frames = (load_image(p, config.content_shape) for p in paths)

    if args.quant == "int8":
        if path != "fused":
            raise SystemExit(
                f"--quant int8 requires the fused path (got '{path}'); pass "
                "--path fused on a fused-family config")
        scales, frames = _get_scales(
            args, fused, frames, style_params, weights, variables,
            prepared=prepared)
        fused = FusedTransfer(jax.device_get(variables), plan,
                              num_styles=config.num_styles,
                              interpret=fused.interpret,
                              quant="int8", act_scales=scales)
        prepared = fused.prepare_style(style_params, weights)
        # the stylize lambda above late-binds fused/prepared; only the
        # early-bound pack method needs rebinding
        preprocess = fused.pack_frame_np

    def batched_frames():
        for i, frame in enumerate(frames):
            if args.max_frames is not None and i >= args.max_frames:
                return
            yield frame[None]

    sink = VideoSink(args.output, args.fps, args.bitrate, config.output_dimensions)
    # Warm the compile cache so the first frame's latency is real, not compile.
    warm = np.zeros((1,) + config.content_shape, np.float32)
    warm = preprocess(warm) if preprocess is not None else jnp.asarray(warm)
    jax.device_get(stylize(variables, jax.device_put(warm), style_params))
    device_put = jax.device_put
    if preprocess is not None:
        device_put = lambda frame: jax.device_put(preprocess(frame))  # noqa: E731
    timer = FrameTimer()
    with trace(str(args.profile_dir) if args.profile_dir else None):
        # Prefetch overlaps decode + H2D with the transfer net (reference used
        # .prefetch(5)); depth 3 keeps at most 3 frames in flight.
        for content in DevicePrefetcher(
                batched_frames(), depth=3, device_put=device_put):
            with timer.frame():
                out = stylize(variables, content, style_params)
                frame = np.asarray(jax.device_get(out))[0]
            sink.write(frame)
    sink.close()
    stats = timer.percentiles()
    log.info("frame latency: %s", {k: round(v, 3) for k, v in stats.items()})


if __name__ == "__main__":
    main()
