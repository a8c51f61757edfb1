"""Per-op attribution from jax.profiler xplane traces.

The tensorboard_plugin_profile converter shipped in this image is
protobuf-version-broken, so this module parses the raw ``*.xplane.pb``
directly (TF tsl proto schema) and aggregates TPU "XLA Ops" line events by
op name and HLO category — the tool that turns a fused-program trace into
an optimization worklist.

Usage::

    python -m multimodal_embeddings_tpu.utils.trace_analysis /tmp/trace_dir
"""

from __future__ import annotations

import dataclasses
import glob
import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple


@dataclasses.dataclass
class OpStat:
    name: str
    category: str
    total_us: float
    count: int


def _load_xspace(trace_dir: str):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb")
    ) or glob.glob(os.path.join(trace_dir, "*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space


def aggregate_xla_ops(trace_dir: str, line_name: str = "XLA Ops") -> List[OpStat]:
    """Aggregate device-plane op events by (name, hlo category)."""
    space = _load_xspace(trace_dir)
    totals: Dict[Tuple[str, str], List[float]] = defaultdict(lambda: [0.0, 0])
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        event_meta = dict(plane.event_metadata)
        stat_meta = {k: v.name for k, v in plane.stat_metadata.items()}
        for line in plane.lines:
            if line.name != line_name:
                continue
            for event in line.events:
                meta = event_meta.get(event.metadata_id)
                name = meta.name if meta else "?"
                category = ""
                for stat in event.stats:
                    if stat_meta.get(stat.metadata_id) == "hlo_category":
                        category = (
                            stat.str_value
                            or stat_meta.get(stat.ref_value, "")
                        )
                # also look at metadata-level stats (category often lives there)
                if not category and meta is not None:
                    for stat in meta.stats:
                        if stat_meta.get(stat.metadata_id) == "hlo_category":
                            category = (
                                stat.str_value
                                or stat_meta.get(stat.ref_value, "")
                            )
                key = (name, category)
                totals[key][0] += event.duration_ps / 1e6  # ps → us
                totals[key][1] += 1
    return sorted(
        (
            OpStat(name=k[0], category=k[1], total_us=v[0], count=v[1])
            for k, v in totals.items()
        ),
        key=lambda s: -s.total_us,
    )


def category_summary(stats: List[OpStat]) -> Dict[str, float]:
    by_cat: Dict[str, float] = defaultdict(float)
    for stat in stats:
        by_cat[stat.category or "uncategorized"] += stat.total_us
    return dict(sorted(by_cat.items(), key=lambda kv: -kv[1]))


def print_report(
    trace_dir: str, top: int = 30, category: Optional[str] = None
) -> None:
    stats = aggregate_xla_ops(trace_dir)
    grand = sum(s.total_us for s in stats)
    print(f"device op time: {grand / 1e3:.2f} ms across {len(stats)} distinct ops")
    print("\nby HLO category:")
    for cat, us in category_summary(stats).items():
        print(f"  {cat:<28s} {us / 1e3:9.2f} ms  ({100 * us / grand:4.1f}%)")
    if category:
        stats = [
            s for s in stats if category.lower() in (s.category or "").lower()
        ]
        print(f"\ntop {top} ops in category '{category}':")
    else:
        print(f"\ntop {top} ops:")
    for stat in stats[:top]:
        print(
            f"  {stat.total_us / 1e3:8.2f} ms  x{stat.count:<4d} "
            f"[{stat.category or '-':<16s}] {stat.name[:160]}"
        )


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("trace_dir", nargs="?", default="/tmp/fused_trace")
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument(
        "--category",
        default=None,
        help="only list ops whose HLO category contains this substring "
        "(e.g. 'data formatting' to rank the relayout copies)",
    )
    args = parser.parse_args()
    print_report(args.trace_dir, top=args.top, category=args.category)
