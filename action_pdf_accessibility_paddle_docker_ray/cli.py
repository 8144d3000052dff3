"""CLI driver with the reference's action surface, re-targeted at Ray Data.

Mirrors the reference's four subcommands and argument set
(/root/reference/src/main.py:456-563) — ``config``, ``tag``, ``template``,
``mathml`` — with the same knobs (model choice, zoom ∈ [1, 10], 23
per-class threshold arguments clamped to [0.05, 0.95], process_formula /
process_table booleans) and the same error-code taxonomy
(/root/reference/src/exceptions.py:3-17), re-expressed for a distributed
engine:

- ``tag``:      pages parquet → extracted docs parquet (text + spans +
                template + formulas) — the reference's PDF→tagged-PDF,
                with ``--resume`` running the manifest-checkpointed path.
- ``template``: pages parquet → (url, template_json) parquet with
                ``process_formula`` hardwired off, exactly like
                /root/reference/src/create_template.py:92.
- ``mathml``:   ``.tex``→``.xml`` converts one LaTeX formula (the stub
                stand-in for the formula-recognition model) to annotated
                MathML; parquet→parquet emits the per-url formula table.
- ``config``:   dumps the engine's integration JSON.

Run standalone (``python -m action_pdf_accessibility_paddle_docker_ray.cli ...``); it owns its
Ray session (``ray job submit`` wraps the same entry point on a cluster).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Optional

from . import __version__
from .functions.labels import LAYOUT_CLASS_NAMES, SUPPORTED_MODELS, clamp

# error-code taxonomy (reference exceptions.py:3-17; PDFix-specific codes
# map onto the analogous engine failures)
EC_ARG_GENERAL = 10
EC_ARG_ZOOM = 11
EC_ARG_INPUT_OUTPUT_NOT_ALLOWED = 14
EC_ENGINE_FAILED_TO_OPEN = 24
EC_ENGINE_FAILED_TO_SAVE = 25

# threshold knob order = class-id order (reference main.py:429-453)
_THRESHOLD_ARGS = [f"threshold_{name}" for name in LAYOUT_CLASS_NAMES]
_LOW_DEFAULT = {"paragraph_title", "formula", "header", "seal", "header_image"}


def str2bool(value) -> bool:
    """/root/reference/src/main.py:25-42."""
    if isinstance(value, bool):
        return value
    if value.lower() in ("yes", "true", "t", "1"):
        return True
    if value.lower() in ("no", "false", "f", "0"):
        return False
    raise ValueError("Boolean value expected.")


def create_threshold_dictionary(args) -> dict[int, float]:
    """class-id → clamped threshold (reference main.py:419-453)."""
    return {
        i: clamp(float(getattr(args, f"threshold_{name}")))
        for i, name in enumerate(LAYOUT_CLASS_NAMES)
    }


def _add_common_args(p: argparse.ArgumentParser, thresholds: bool = True) -> None:
    p.add_argument("--input", "-i", required=True, help="Input pages parquet file/dir.")
    p.add_argument("--output", "-o", required=True, help="Output path.")
    p.add_argument("--model", choices=list(SUPPORTED_MODELS), default="PP-DocLayout-L")
    p.add_argument("--zoom", type=float, default=2.0,
                   help="Zoom level for page rendering (default: 2.0).")
    p.add_argument("--cpus", type=int, default=None, help="num_cpus for ray.init.")
    if thresholds:
        for name in LAYOUT_CLASS_NAMES:
            p.add_argument(
                f"--threshold_{name}", type=float,
                default=0.3 if name in _LOW_DEFAULT else 0.5,
            )


def integration_config() -> dict:
    return {
        "version": __version__,
        "engine": "ray-data",
        "actions": [
            {"name": "tag", "input": "pages parquet", "output": "docs parquet"},
            {"name": "template", "input": "pages parquet", "output": "template parquet"},
            {"name": "mathml", "input": "latex (.tex) | pages parquet",
             "output": "mathml xml | formulas parquet"},
        ],
        "models": list(SUPPORTED_MODELS),
        "thresholds": {n: (0.3 if n in _LOW_DEFAULT else 0.5) for n in LAYOUT_CLASS_NAMES},
    }


def _init_ray(cpus: Optional[int]) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if cpus:
            kwargs["num_cpus"] = cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def run_config(args) -> int:
    payload = json.dumps(integration_config(), indent=2)
    if getattr(args, "output", None):
        with open(args.output, "w") as f:
            f.write(payload)
    else:
        print(payload)
    return 0


def run_tag(args) -> int:
    if args.zoom < 1.0 or args.zoom > 10.0:
        print("Zoom level must between 1.0 and 10.0.", file=sys.stderr)
        return EC_ARG_ZOOM
    _init_ray(args.cpus)
    thresholds = create_threshold_dictionary(args)
    try:
        if args.resume:
            from .state.manifest import metrics_report, run_resumable

            summary = run_resumable(
                args.input, args.output, model=args.model, zoom=args.zoom,
                thresholds=thresholds, process_table=args.process_table,
                process_formula=args.process_formula,
            )
            print(json.dumps({"run": summary, "report": metrics_report(args.output)}))
        else:
            from .pipelines.extract import extract_pipeline

            ds = extract_pipeline(
                args.input, model=args.model, zoom=args.zoom, thresholds=thresholds,
                process_table=args.process_table, process_formula=args.process_formula,
            )
            ds.write_parquet(args.output, partition_cols=["size_bucket"])
    except FileNotFoundError as exc:
        print(f"Failed to open input: {exc}", file=sys.stderr)
        return EC_ENGINE_FAILED_TO_OPEN
    return 0


def run_template(args) -> int:
    """process_formula hardwired False (reference create_template.py:92)."""
    if args.zoom < 1.0 or args.zoom > 10.0:
        print("Zoom level must between 1.0 and 10.0.", file=sys.stderr)
        return EC_ARG_ZOOM
    _init_ray(args.cpus)
    from .pipelines.extract import extract_pipeline

    thresholds = create_threshold_dictionary(args)
    try:
        ds = extract_pipeline(
            args.input, model=args.model, zoom=args.zoom, thresholds=thresholds,
            process_table=args.process_table, process_formula=False,
        )
        ds.select_columns(["url", "template_json"]).write_parquet(args.output)
    except FileNotFoundError as exc:
        print(f"Failed to open input: {exc}", file=sys.stderr)
        return EC_ENGINE_FAILED_TO_OPEN
    return 0


def run_mathml(args) -> int:
    from .functions.mathml import add_mathml_metadata, latex_to_mathml

    if args.input.lower().endswith(".tex") and args.output.lower().endswith(".xml"):
        try:
            with open(args.input) as f:
                latex = f.read().strip()
        except OSError:
            return EC_ENGINE_FAILED_TO_OPEN
        # raw MathML, no <semantics> wrapping: the reference defines
        # add_mathml_metadata but never calls it in any flow
        # (/root/reference/src/ai.py:207 — definition only); pass
        # --annotate to opt in to the wrapped form
        mathml = latex_to_mathml(latex)
        if mathml and getattr(args, "annotate", False):
            mathml = add_mathml_metadata(mathml)
        with open(args.output, "w") as f:
            f.write(mathml)
        return 0
    if args.output.lower().endswith((".parquet", "/")) or not args.output.lower().endswith(".xml"):
        _init_ray(args.cpus)
        from .pipelines.extract import extract_pipeline

        try:
            # zoom=1.0: the reference's mathml pdf->pdf mode re-renders
            # formula elements at zoom 1 (/root/reference/src/generate_mathml.py:226)
            ds = extract_pipeline(args.input, zoom=1.0)
            ds.select_columns(["url", "formulas_json"]).write_parquet(args.output)
        except FileNotFoundError as exc:
            print(f"Failed to open input: {exc}", file=sys.stderr)
            return EC_ENGINE_FAILED_TO_OPEN
        return 0
    print("Not allowed input output file combination. Please see --help.", file=sys.stderr)
    return EC_ARG_INPUT_OUTPUT_NOT_ALLOWED


def main(argv: Optional[list[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        description="Ray-Data-native main-content extraction engine "
        "(reference action surface: config / tag / template / mathml)",
    )
    sub = parser.add_subparsers(dest="subparser")

    p_config = sub.add_parser("config", help="Extract config file for integration.")
    p_config.add_argument("--output", "-o", default=None)
    p_config.set_defaults(func=run_config)

    p_tag = sub.add_parser("tag", help="Run extraction over a pages table.")
    _add_common_args(p_tag)
    p_tag.add_argument("--process_formula", type=str2bool, default=True)
    p_tag.add_argument("--process_table", type=str2bool, default=True)
    p_tag.add_argument("--resume", action="store_true",
                       help="Manifest-checkpointed resumable run.")
    p_tag.set_defaults(func=run_tag)

    p_tpl = sub.add_parser("template", help="Create layout template JSON table.")
    _add_common_args(p_tpl)
    p_tpl.add_argument("--process_table", type=str2bool, default=True)
    p_tpl.set_defaults(func=run_template)

    p_ml = sub.add_parser(
        "mathml",
        help="Generate MathML. Modes: .tex -> .xml (single formula), "
        "pages parquet -> formulas parquet.",
    )
    p_ml.add_argument("--input", "-i", required=True)
    p_ml.add_argument("--output", "-o", required=True)
    p_ml.add_argument("--cpus", type=int, default=None)
    p_ml.add_argument("--annotate", action="store_true",
                      help="Wrap output in <semantics> with annotations.")
    p_ml.set_defaults(func=run_mathml)

    try:
        args = parser.parse_args(argv)
    except SystemExit as exc:
        return int(exc.code) if exc.code else 0
    if not getattr(args, "func", None):
        parser.print_help()
        return EC_ARG_GENERAL
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
