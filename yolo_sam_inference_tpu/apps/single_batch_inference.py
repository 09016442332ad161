"""Flat-folder inference runner.

Parity with reference ``examples/single_batch_inference.py``: process every
image in a directory, write ``cell_metrics.csv`` / ``processing_times.csv`` /
``run_summary.txt`` and optional visualizations, print summary statistics.

Usage:
    python -m yolo_sam_inference_tpu.apps.single_batch_inference \
        --input-dir IMGS --output-dir OUT [--yolo-model best.pt]
        [--sam-model facebook/sam-vit-base] [--sam-checkpoint model.safetensors]
        [--batch-size 8] [--save-visualizations]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Run YOLO+SAM cell analysis on a folder")
    p.add_argument("--input-dir", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--yolo-model", type=str, default=None,
                   help="YOLO checkpoint path (state dict .pt)")
    p.add_argument("--sam-model", type=str, default="facebook/sam-vit-base",
                   help="SAM variant (reference default for this runner was vit-huge)")
    p.add_argument("--sam-checkpoint", type=str, default=None)
    p.add_argument("--experiment-id", type=str, default=None,
                   help="MLflow experiment id (optional)")
    p.add_argument("--run-id", type=str, default=None, help="MLflow run id (optional)")
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-det", type=int, default=24)
    p.add_argument("--save-visualizations", action="store_true")
    p.add_argument("--hull-mode", choices=("polygon", "reference"), default="polygon",
                   help="hull measurement: exact polygon (default) or the "
                        "reference's rasterize+regionprops procedure")
    p.add_argument("--quant", choices=("none", "int8"), default="none",
                   help="int8 = dynamic w8a8 SAM-encoder matmuls (~10-19%% "
                        "faster; accuracy bounds: apps/quant_report.py)")
    p.add_argument("--encoder-parallel", choices=("none", "tp", "sp"),
                   default="none",
                   help="shard the SAM ViT encoder over devices to buy "
                        "per-image latency: tp = Megatron head/MLP-hidden "
                        "sharding, sp = sequence (token-row) sharding "
                        "(docs/SCALING.md; not composable with --quant int8)")
    p.add_argument("--parallel-devices", type=int, default=0,
                   help="device count for --encoder-parallel (0 = all "
                        "visible devices)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    if not args.input_dir.is_dir():
        print(f"error: --input-dir does not exist: {args.input_dir}")
        return 2
    from ..pipeline.engine import CellSegmentationPipeline, PipelineOptions
    from ..reporting import print_summary, save_results_to_csv, save_run_summary
    from ..utils.metrics_reporter import report_summary_statistics
    from ..utils.model_loader import load_model_from_mlflow

    yolo_path = args.yolo_model
    if yolo_path is None and args.run_id:
        yolo_path = load_model_from_mlflow(args.experiment_id or "", args.run_id)

    opts = PipelineOptions(batch_size=args.batch_size, max_det=args.max_det,
                           hull_mode=args.hull_mode, quant=args.quant,
                           encoder_parallel=args.encoder_parallel)
    mesh = None
    if args.encoder_parallel != "none":
        from ..parallel.mesh import make_encoder_parallel_mesh

        mesh = make_encoder_parallel_mesh(args.encoder_parallel,
                                          args.parallel_devices)
    pipeline = CellSegmentationPipeline(
        yolo_model_path=yolo_path,
        sam_model_type=args.sam_model,
        sam_checkpoint=args.sam_checkpoint,
        device=args.device,
        options=opts,
        mesh=mesh,
    )

    t0 = time.time()
    batch = pipeline.process_directory(
        args.input_dir, args.output_dir, save_visualizations=args.save_visualizations
    )
    runtime = time.time() - t0

    run_dir = Path(args.output_dir) / pipeline.run_id
    save_results_to_csv(batch, run_dir)
    save_run_summary(batch, args.input_dir, run_dir, pipeline.run_id, runtime)
    print_summary(batch, runtime)
    all_metrics = [m for r in batch.results for m in r.cell_metrics]
    report_summary_statistics(all_metrics)
    print(f"\nResults written to {run_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
