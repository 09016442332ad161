"""The canonical project runner: project/ -> conditions/ -> batches/ of images.

Parity with reference ``examples/example_project_inference.py``: per-condition
batch merge (images processed with a ``{batch}_`` name prefix), per-condition
CSVs + summaries, global combined CSVs, ROI gating producing
``gated_cell_metrics.csv`` globally and per condition, and a run summary.

ROI selection: ``--roi-file`` (pre-made ``roi_coordinates.json``),
``--roi x_min,x_max[,y_min,y_max]`` applied to all conditions, or
``--interactive-roi`` to launch the browser picker (``web/app.py``).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Dict, List

import pandas as pd


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Project-level YOLO+SAM cell analysis")
    p.add_argument("--project-dir", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--yolo-model", type=str, default=None)
    p.add_argument("--sam-model", type=str, default="facebook/sam-vit-base")
    p.add_argument("--sam-checkpoint", type=str, default=None)
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-det", type=int, default=24)
    p.add_argument("--num-pipelines", type=int, default=2,
                   help="accepted for reference API parity; batching replaces replicas")
    p.add_argument("--save-visualizations", action="store_true")
    p.add_argument("--hull-mode", choices=("polygon", "reference"), default="polygon",
                   help="hull measurement: exact polygon (default) or the "
                        "reference's rasterize+regionprops procedure")
    p.add_argument("--encoder-parallel", choices=("none", "tp", "sp"),
                   default="none",
                   help="shard the SAM ViT encoder over devices to buy "
                        "per-image latency: tp = Megatron head/MLP-hidden "
                        "sharding, sp = sequence (token-row) sharding "
                        "(docs/SCALING.md; not composable with --quant int8)")
    p.add_argument("--parallel-devices", type=int, default=0,
                   help="device count for --encoder-parallel (0 = all "
                        "visible devices)")
    p.add_argument("--quant", choices=("none", "int8"), default="none",
                   help="int8 = dynamic w8a8 SAM-encoder matmuls (~10-19%% "
                        "faster; accuracy bounds: apps/quant_report.py)")
    p.add_argument("--roi-file", type=Path, default=None)
    p.add_argument("--roi", type=str, default=None,
                   help="x_min,x_max[,y_min,y_max] applied to every condition")
    p.add_argument("--interactive-roi", action="store_true",
                   help="launch the browser ROI picker")
    p.add_argument("--cv2-roi", action="store_true",
                   help="legacy cv2 click-two-lines picker per condition "
                        "(the reference's original interaction, "
                        "examples/example_project_inference.py:226-262; "
                        "needs a display — headless hosts use the web "
                        "picker or --roi/--roi-file)")
    p.add_argument("--port", type=int, default=9487)
    p.add_argument("--log-to-mlflow", action="store_true",
                   help="track params/metrics/artifacts in MLflow (if installed)")
    p.add_argument("--experiment-name", type=str, default="yolo_sam_inference_tpu")
    p.add_argument("--profile-dir", type=Path, default=None,
                   help="write a jax.profiler trace of the run to this directory")
    return p.parse_args(argv)


def collect_images_from_batches(condition_dir: Path) -> List[Path]:
    """All images across batch_* subdirs; order mirrors the reference's
    prefix-merge (reference ``examples/example_project_inference.py:93-111``)."""
    from ..io.images import list_image_files

    images = []
    batch_dirs = sorted(d for d in condition_dir.iterdir() if d.is_dir())
    for bd in batch_dirs:
        images.extend(list_image_files(bd))
    # images directly under the condition dir also count
    images.extend(list_image_files(condition_dir))
    return images


def resolve_rois(args, condition_names) -> Dict[str, Dict[str, int]]:
    if args.roi_file:
        with open(args.roi_file) as f:
            return json.load(f)
    if args.roi:
        try:
            vals = [int(v) for v in args.roi.split(",")]
            if len(vals) not in (2, 4):
                raise ValueError
        except ValueError:
            raise SystemExit(
                f"error: --roi must be 'x_min,x_max' or 'x_min,x_max,y_min,y_max' "
                f"(integers), got {args.roi!r}"
            )
        roi = {"x_min": vals[0], "x_max": vals[1]}
        if len(vals) >= 4:
            roi.update({"y_min": vals[2], "y_max": vals[3]})
        else:
            roi.update({"y_min": 0, "y_max": 10**9})
        return {c: dict(roi) for c in condition_names}
    if args.interactive_roi:
        from ..web.app import get_roi_coordinates_web

        condition_dirs = [args.project_dir / c for c in condition_names]
        return get_roi_coordinates_web(condition_dirs, args.output_dir, port=args.port)
    if getattr(args, "cv2_roi", False):
        from ..gate.picker import get_roi_coordinates

        rois = {}
        for c in condition_names:
            images = collect_images_from_batches(args.project_dir / c)
            if not images:
                raise SystemExit(f"error: no images found for condition {c!r}")
            x_min, x_max = get_roi_coordinates(images[0])
            rois[c] = {"x_min": x_min, "x_max": x_max,
                       "y_min": 0, "y_max": 10**9}
        return rois
    # no gating: accept everything
    return {c: {"x_min": 0, "x_max": 10**9, "y_min": 0, "y_max": 10**9}
            for c in condition_names}


def main(argv=None) -> int:
    args = parse_args(argv)
    from ..gate.filter import filter_cells_by_roi, save_roi_coordinates
    from ..pipeline.engine import ParallelCellSegmentationPipeline, PipelineOptions
    from ..pipeline.results import BatchProcessingResult, initialize_timing_dict
    from ..registry.tracking import collect_run_metrics, tracked_run
    from ..reporting import print_summary, save_results_to_csv, save_run_summary

    profiler = None
    if args.profile_dir is not None:
        import jax

        args.profile_dir.mkdir(parents=True, exist_ok=True)
        jax.profiler.start_trace(str(args.profile_dir))
        profiler = jax

    t_start = time.time()
    project_dir = args.project_dir
    if not project_dir.is_dir():
        raise SystemExit(f"error: --project-dir does not exist: {project_dir}")
    condition_dirs = sorted(d for d in project_dir.iterdir() if d.is_dir())
    condition_names = [d.name for d in condition_dirs]
    if not condition_names:
        raise SystemExit(f"no condition directories under {project_dir}")

    rois = resolve_rois(args, condition_names)

    opts = PipelineOptions(batch_size=args.batch_size, max_det=args.max_det,
                           hull_mode=args.hull_mode, quant=args.quant,
                           encoder_parallel=args.encoder_parallel)
    mesh = None
    if args.encoder_parallel != "none":
        from ..parallel.mesh import make_encoder_parallel_mesh

        mesh = make_encoder_parallel_mesh(args.encoder_parallel,
                                          args.parallel_devices)
    pipeline = ParallelCellSegmentationPipeline(
        yolo_model_path=args.yolo_model,
        sam_model_type=args.sam_model,
        sam_checkpoint=args.sam_checkpoint,
        device=args.device,
        options=opts,
        num_pipelines=args.num_pipelines,
        mesh=mesh,
    )
    run_dir = Path(args.output_dir) / pipeline.run_id
    run_dir.mkdir(parents=True, exist_ok=True)
    save_roi_coordinates(rois, run_dir / "roi_coordinates.json")
    import dataclasses as _dc

    with open(run_dir / "pipeline_parameters.json", "w") as f:
        json.dump(
            {
                **{k: str(v) if not isinstance(v, (int, float, bool, type(None))) else v
                   for k, v in _dc.asdict(pipeline.options).items()},
                "sam_model_type": pipeline.sam_model_type,
                "run_id": pipeline.run_id,
            },
            f,
            indent=2,
        )

    all_results, all_metrics, all_timing = [], [], []
    total_timing = initialize_timing_dict()

    for cond_dir in condition_dirs:
        cond = cond_dir.name
        images = collect_images_from_batches(cond_dir)
        if not images:
            continue
        cond_out = run_dir / cond
        cond_out.mkdir(parents=True, exist_ok=True)
        t0 = time.time()
        batch = pipeline.process_directory(
            cond_dir, cond_out, save_visualizations=args.save_visualizations,
            image_paths=images, progress=True,
        )
        cond_runtime = time.time() - t0
        for res in batch.results:
            res.condition = cond
        for row in batch.metrics_data:
            row["condition"] = cond
        for row in batch.timing_data:
            row["condition"] = cond
        cond_run_dir = cond_out / pipeline.run_id
        save_results_to_csv(batch, cond_run_dir)
        save_run_summary(
            batch, cond_dir, cond_run_dir, pipeline.run_id, cond_runtime,
            summary_name="condition_summary.txt", is_condition_summary=True,
        )
        all_results.extend(batch.results)
        all_metrics.extend(batch.metrics_data)
        all_timing.extend(batch.timing_data)
        for key in total_timing:
            total_timing[key] += batch.total_timing.get(key, 0)

    combined = BatchProcessingResult(
        results=all_results,
        total_timing=total_timing,
        metrics_data=all_metrics,
        timing_data=all_timing,
    )
    save_results_to_csv(combined, run_dir)

    # ROI gating
    if all_metrics:
        metrics_df = pd.DataFrame(all_metrics)
        gated = filter_cells_by_roi(metrics_df, rois)
        fixed = ["condition", "image_name", "cell_id"]
        cols = [c for c in fixed if c in gated.columns] + [
            c for c in gated.columns if c not in fixed
        ]
        gated[cols].to_csv(run_dir / "gated_cell_metrics.csv", index=False)
        for cond in condition_names:
            cond_gated = gated[gated["condition"] == cond]
            cond_dir_out = run_dir / cond / pipeline.run_id
            if cond_dir_out.exists():
                cond_gated[cols].to_csv(
                    cond_dir_out / "gated_cell_metrics.csv", index=False
                )

    runtime = time.time() - t_start
    save_run_summary(combined, project_dir, run_dir, pipeline.run_id, runtime)
    print_summary(combined, runtime)

    if profiler is not None:
        profiler.profiler.stop_trace()
        print(f"profiler trace written to {args.profile_dir}")

    if args.log_to_mlflow:
        gated_count = None
        if (run_dir / "gated_cell_metrics.csv").exists():
            gated_count = len(pd.read_csv(run_dir / "gated_cell_metrics.csv"))
        with tracked_run(args.experiment_name, run_name=pipeline.run_id) as tracker:
            tracker.log_params(
                {
                    "project_dir": str(project_dir),
                    "sam_model": args.sam_model,
                    "yolo_model": args.yolo_model,
                    "batch_size": args.batch_size,
                    "max_det": args.max_det,
                    "conditions": ",".join(condition_names),
                }
            )
            tracker.log_metrics(collect_run_metrics(combined, gated_count))
            tracker.log_run_outputs(run_dir)
            if all_metrics and tracker.enabled:
                from ..registry.tracking import create_summary_figures

                for fig in create_summary_figures(
                    pd.DataFrame(all_metrics), run_dir / "figures"
                ):
                    tracker.log_artifact(fig)

    print(f"\nResults written to {run_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
