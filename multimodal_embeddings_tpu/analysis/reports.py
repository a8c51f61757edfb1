"""Clustering visualizations and the full HTML report.

Equivalents of the reference's matplotlib heatmap, scipy dendrogram,
networkx similarity graph and HTML cluster report
(``weighted_region_clustering.py:256-450,576-797``). Plotting is host-side
and optional (gated on matplotlib/networkx availability).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from multimodal_embeddings_tpu.analysis import html as H
from multimodal_embeddings_tpu.analysis.clustering import ClusteringResult
from multimodal_embeddings_tpu.io.logging_setup import get_logger

logger = get_logger("reports")


def _short(name: str, n: int = 28) -> str:
    return name if len(name) <= n else name[: n - 1] + "…"


def plot_similarity_heatmap(
    similarity: np.ndarray, names: Sequence[str], output_path: str
) -> bool:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover
        return False
    fig, ax = plt.subplots(figsize=(10, 8))
    im = ax.imshow(similarity, cmap="viridis", vmin=0, vmax=1)
    labels = [_short(n) for n in names]
    ax.set_xticks(range(len(names)))
    ax.set_yticks(range(len(names)))
    ax.set_xticklabels(labels, rotation=90, fontsize=6)
    ax.set_yticklabels(labels, fontsize=6)
    fig.colorbar(im, label="weighted region similarity")
    ax.set_title("Page similarity (area-weighted region matches)")
    fig.tight_layout()
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    fig.savefig(output_path, dpi=150)
    plt.close(fig)
    return True


def plot_dendrogram(
    result: ClusteringResult, output_path: str
) -> bool:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from scipy.cluster.hierarchy import dendrogram
    except Exception:  # pragma: no cover
        return False
    fig, ax = plt.subplots(figsize=(11, 6))
    dendrogram(
        result.linkage,
        labels=[_short(n) for n in result.names],
        leaf_rotation=90,
        leaf_font_size=7,
        ax=ax,
    )
    ax.set_title(
        f"Average-linkage dendrogram (k={result.n_clusters}, "
        f"silhouette={result.silhouette:.3f})"
    )
    fig.tight_layout()
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    fig.savefig(output_path, dpi=150)
    plt.close(fig)
    return True


def plot_similarity_network(
    similarity: np.ndarray,
    result: ClusteringResult,
    output_path: str,
) -> bool:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import networkx as nx
    except Exception:  # pragma: no cover
        return False
    n = similarity.shape[0]
    graph = nx.Graph()
    for i, name in enumerate(result.names):
        graph.add_node(i, label=_short(name, 18), cluster=int(result.labels[i]))
    # adaptive threshold: keep the strongest edges (~3 per node), like the
    # reference's adaptive edge threshold (weighted_region_clustering.py:343-450)
    off = similarity[~np.eye(n, dtype=bool)]
    threshold = np.quantile(off, max(0.0, 1 - 6.0 / max(n, 1))) if off.size else 0
    for i in range(n):
        for j in range(i + 1, n):
            if similarity[i, j] >= threshold and similarity[i, j] > 0:
                graph.add_edge(i, j, weight=float(similarity[i, j]))
    pos = nx.spring_layout(graph, seed=0, weight="weight")
    fig, ax = plt.subplots(figsize=(10, 8))
    colors = [graph.nodes[i]["cluster"] for i in graph.nodes]
    nx.draw_networkx_nodes(
        graph, pos, node_color=colors, cmap="tab10", node_size=320, ax=ax
    )
    nx.draw_networkx_edges(
        graph,
        pos,
        width=[graph[u][v]["weight"] * 3 for u, v in graph.edges],
        alpha=0.4,
        ax=ax,
    )
    nx.draw_networkx_labels(
        graph, pos, {i: graph.nodes[i]["label"] for i in graph.nodes}, font_size=6, ax=ax
    )
    ax.set_title("Similarity network (node color = cluster)")
    ax.axis("off")
    fig.tight_layout()
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    fig.savefig(output_path, dpi=150)
    plt.close(fig)
    return True


def create_cluster_report(
    similarity: np.ndarray,
    result: ClusteringResult,
    output_folder: str,
    image_paths: Optional[Dict[str, str]] = None,
    top_pairs: int = 50,
) -> str:
    """Full HTML report: cluster tables, top pairs, colored matrix, linked
    plots; also saves similarity_matrix.npy + clustering_results.json
    (``weighted_region_clustering.py:576-797,870-892``)."""
    os.makedirs(output_folder, exist_ok=True)
    np.save(os.path.join(output_folder, "similarity_matrix.npy"), similarity)
    with open(os.path.join(output_folder, "clustering_results.json"), "w") as f:
        json.dump(
            {
                "names": result.names,
                "labels": result.labels.tolist(),
                "n_clusters": result.n_clusters,
                "silhouette": result.silhouette,
                "cohesion": {str(k): v for k, v in result.cohesion.items()},
            },
            f,
            indent=2,
        )

    heatmap_ok = plot_similarity_heatmap(
        similarity, result.names, os.path.join(output_folder, "similarity_heatmap.png")
    )
    dendro_ok = plot_dendrogram(
        result, os.path.join(output_folder, "dendrogram.png")
    )
    network_ok = plot_similarity_network(
        similarity, result, os.path.join(output_folder, "similarity_network.png")
    )

    sections = [
        f"<div class='card'>pages: {len(result.names)} · clusters: "
        f"{result.n_clusters} · silhouette: {result.silhouette:.4f}</div>"
    ]

    for cluster_id, members in sorted(result.clusters().items()):
        rows = []
        for name in members:
            cell = name
            if image_paths and name in image_paths:
                cell = (
                    f"<a href='{image_paths[name]}'>{name}</a>"
                )
            rows.append([cell])
        sections.append(
            f"<div class='card'><h2>Cluster {cluster_id} "
            f"({len(members)} pages, cohesion "
            f"{result.cohesion.get(cluster_id, 0):.3f})</h2>"
            + H.table(["page"], rows)
            + "</div>"
        )

    n = similarity.shape[0]
    pairs = [
        (similarity[i, j], result.names[i], result.names[j])
        for i in range(n)
        for j in range(i + 1, n)
    ]
    pairs.sort(reverse=True)
    sections.append(
        "<div class='card'><h2>Top similar pairs</h2>"
        + H.table(
            ["similarity", "page a", "page b"],
            [[f"{s:.4f}", a, b] for s, a, b in pairs[:top_pairs]],
        )
        + "</div>"
    )

    header = [""] + [str(i) for i in range(n)]
    matrix_html = "<table class='matrix'><tr>" + "".join(
        f"<th>{h}</th>" for h in header
    )
    matrix_html += "</tr>"
    for i in range(n):
        matrix_html += f"<tr><td>{_short(result.names[i], 20)}</td>"
        for j in range(n):
            matrix_html += H.colored_cell(similarity[i, j])
        matrix_html += "</tr>"
    matrix_html += "</table>"
    sections.append(
        "<div class='card'><h2>Similarity matrix</h2>" + matrix_html + "</div>"
    )

    for ok, img, title in (
        (heatmap_ok, "similarity_heatmap.png", "Heatmap"),
        (dendro_ok, "dendrogram.png", "Dendrogram"),
        (network_ok, "similarity_network.png", "Network"),
    ):
        if ok:
            sections.append(
                f"<div class='card'><h2>{title}</h2><img src='{img}' "
                "style='max-width:100%'></div>"
            )

    report_path = os.path.join(output_folder, "clustering_report.html")
    H.write_page(report_path, "Weighted region clustering report", "".join(sections))
    logger.info("cluster report written to %s", report_path)
    return report_path
