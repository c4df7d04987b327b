"""HTML retrieval visualizer (rank-0 side effect).

Capability-parity target: `EgoVLPv2/utils/visualizer.py:14` + `utils/html.py`
(dominate-based retrieval result pages). Re-implemented with plain string
templates — no extra dependency — producing a self-contained web/ directory
with per-epoch pages listing each text query and its top-k retrieved videos.
"""

from __future__ import annotations

import html
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ font-family: sans-serif; margin: 2em; }}
table {{ border-collapse: collapse; width: 100%; }}
td, th {{ border: 1px solid #ccc; padding: 6px 10px; font-size: 14px; }}
tr.hit td {{ background: #e7f7e7; }}
tr.miss td {{ background: #fbecec; }}
video {{ max-width: 280px; }}
</style></head><body>
<h1>{title}</h1>
{body}
</body></html>
"""


class RetrievalVisualizer:
    def __init__(self, web_dir: str, name: str = "retrieval"):
        self.web_dir = web_dir
        self.name = name
        os.makedirs(web_dir, exist_ok=True)

    def write_epoch(
        self,
        epoch: int,
        queries: Sequence[str],
        sims: np.ndarray,  # [num_queries, num_videos]
        video_paths: Optional[Sequence[str]] = None,
        gt_indices: Optional[Sequence[int]] = None,
        top_k: int = 5,
        metrics: Optional[Dict[str, float]] = None,
    ) -> str:
        rows = []
        if metrics:
            stats = " | ".join(f"{k}: {v:.2f}" for k, v in metrics.items())
            rows.append(f"<p><b>{html.escape(stats)}</b></p>")
        rows.append("<table><tr><th>#</th><th>query</th><th>top retrievals"
                    "</th><th>gt rank</th></tr>")
        order = np.argsort(-sims, axis=1)
        for i, q in enumerate(queries):
            top = order[i, :top_k]
            cells = []
            for j in top:
                label = (
                    html.escape(os.path.basename(str(video_paths[j])))
                    if video_paths is not None else f"video {j}"
                )
                mark = " ✓" if gt_indices is not None and j == gt_indices[i] else ""
                cells.append(f"{label} ({sims[i, j]:.3f}){mark}")
            gt_rank = ""
            cls = ""
            if gt_indices is not None:
                rank = int(np.where(order[i] == gt_indices[i])[0][0]) + 1
                gt_rank = str(rank)
                cls = "hit" if rank <= top_k else "miss"
            rows.append(
                f'<tr class="{cls}"><td>{i}</td><td>{html.escape(str(q))}</td>'
                f"<td>{' | '.join(cells)}</td><td>{gt_rank}</td></tr>"
            )
        rows.append("</table>")
        path = os.path.join(self.web_dir, f"{self.name}_epoch{epoch}.html")
        with open(path, "w") as f:
            f.write(_PAGE.format(title=f"{self.name} epoch {epoch}",
                                 body="\n".join(rows)))
        self._write_index()
        return path

    def _write_index(self):
        pages = sorted(p for p in os.listdir(self.web_dir) if p.endswith(".html")
                       and p != "index.html")
        links = "\n".join(f'<p><a href="{p}">{p}</a></p>' for p in pages)
        with open(os.path.join(self.web_dir, "index.html"), "w") as f:
            f.write(_PAGE.format(title="retrieval results", body=links))
