"""CLI: render the law graph to a standalone interactive HTML file.

Parity with the reference's ``data/graph/law_graph.html`` artifact: a
self-contained force-directed visualization (vanilla canvas JS, no CDN —
works in zero-egress environments). Edges are colored by relation; nodes
show article ids with hover detail.

Usage: python -m scripts.graph_viz [--lang zh] [--max-nodes 400]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from legalrag_tpu.config import AppConfig
from legalrag_tpu.utils import get_logger

log = get_logger("graph_viz")

TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Law graph (__LANG__)</title>
<style>
 body { margin:0; background:#0f1419; color:#e6edf3; font:13px system-ui; }
 #info { position:fixed; top:10px; left:10px; background:#1a2128cc;
         padding:8px 12px; border-radius:8px; max-width:380px; }
 .legend span { margin-right:10px; }
 canvas { display:block; }
</style></head><body>
<div id="info"><b>Law graph — __LANG__</b> · __N__ nodes, __E__ edges
 <div class="legend">__LEGEND__</div><div id="hover">hover a node…</div></div>
<canvas id="c"></canvas>
<script>
const DATA = __DATA__;
const COLORS = {cite:"#4c9aff", cited:"#2b5fa3", defined_by:"#3fb950",
                defines_term:"#2a7a38", prev:"#555f6a", next:"#555f6a"};
const cv = document.getElementById("c"), ctx = cv.getContext("2d");
function resize(){ cv.width = innerWidth; cv.height = innerHeight; }
resize(); addEventListener("resize", resize);
const N = DATA.nodes.length;
DATA.nodes.forEach((n,i)=>{ n.x = cv.width/2 + Math.cos(i*2.39996)*Math.sqrt(i)*14;
                            n.y = cv.height/2 + Math.sin(i*2.39996)*Math.sqrt(i)*14;
                            n.vx = 0; n.vy = 0; });
const idx = {}; DATA.nodes.forEach((n,i)=> idx[n.id]=i);
const edges = DATA.edges.filter(e => e[0] in idx && e[1] in idx);
function step(){
  for (const n of DATA.nodes){ n.vx *= .85; n.vy *= .85; }
  for (let i=0;i<N;i++) for (let j=i+1;j<N;j+=7){
    const a=DATA.nodes[i], b=DATA.nodes[j];
    let dx=a.x-b.x, dy=a.y-b.y, d2=dx*dx+dy*dy+1;
    if (d2 < 40000){ const f=120/d2; a.vx+=dx*f; a.vy+=dy*f; b.vx-=dx*f; b.vy-=dy*f; }
  }
  for (const [s,t] of edges){
    const a=DATA.nodes[idx[s]], b=DATA.nodes[idx[t]];
    const dx=b.x-a.x, dy=b.y-a.y;
    a.vx+=dx*.002; a.vy+=dy*.002; b.vx-=dx*.002; b.vy-=dy*.002;
  }
  for (const n of DATA.nodes){
    n.vx += (cv.width/2-n.x)*.0005; n.vy += (cv.height/2-n.y)*.0005;
    n.x += n.vx; n.y += n.vy;
  }
}
function draw(){
  ctx.clearRect(0,0,cv.width,cv.height);
  for (const [s,t,rel] of edges){
    const a=DATA.nodes[idx[s]], b=DATA.nodes[idx[t]];
    ctx.strokeStyle = (COLORS[rel]||"#888")+"66"; ctx.lineWidth = rel=="prev"||rel=="next"?0.4:1.1;
    ctx.beginPath(); ctx.moveTo(a.x,a.y); ctx.lineTo(b.x,b.y); ctx.stroke();
  }
  for (const n of DATA.nodes){
    ctx.fillStyle = n === hovered ? "#ffd866" : "#e6edf3";
    ctx.beginPath(); ctx.arc(n.x,n.y, n.deg>6?4:2.5, 0, 7); ctx.fill();
  }
  if (hovered){ ctx.fillStyle="#ffd866"; ctx.font="12px system-ui";
    ctx.fillText(hovered.label, hovered.x+6, hovered.y-6); }
}
let hovered=null;
cv.addEventListener("mousemove", e=>{
  hovered=null;
  for (const n of DATA.nodes){
    if ((n.x-e.clientX)**2 + (n.y-e.clientY)**2 < 64){ hovered=n; break; }
  }
  document.getElementById("hover").textContent =
    hovered ? hovered.label + " — " + hovered.detail : "hover a node…";
});
(function loop(){ step(); draw(); requestAnimationFrame(loop); })();
</script></body></html>
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lang", default="zh")
    ap.add_argument("--max-nodes", type=int, default=400)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cfg = AppConfig.load()
    graph_file = Path(cfg.with_lang(args.lang).paths.graph_file)
    if not graph_file.exists():
        log.error("no graph at %s — run scripts.build_graph", graph_file)
        return
    nodes, edges = [], []
    deg = {}
    with graph_file.open("r", encoding="utf-8") as f:
        records = [json.loads(l) for l in f if l.strip()]
    # keep the most-connected nodes for a readable picture
    for r in records:
        deg[r["article_id"]] = len(r.get("neighbors", []))
    keep = {aid for aid, _ in sorted(deg.items(), key=lambda x: -x[1])
            [: args.max_nodes]}
    rels = set()
    for r in records:
        aid = r["article_id"]
        if aid not in keep:
            continue
        nodes.append({
            "id": aid, "label": r.get("article_no") or aid, "deg": deg[aid],
            "detail": f"{r.get('chapter') or ''} · {deg[aid]} edges "
                      f"· terms: {', '.join(r['meta'].get('defines_terms', [])[:3])}",
        })
        for nb in r.get("neighbors", []):
            if nb["article_id"] in keep:
                edges.append([aid, nb["article_id"], nb["relation"]])
                rels.add(nb["relation"])
    legend = "".join(
        f'<span style="color:{c}">● {r}</span>'
        for r, c in (("cite", "#4c9aff"), ("cited", "#2b5fa3"),
                     ("defined_by", "#3fb950"), ("defines_term", "#2a7a38"),
                     ("prev/next", "#555f6a")) if r.split("/")[0] in rels or r == "prev/next")
    html = (TEMPLATE
            .replace("__LANG__", args.lang)
            .replace("__N__", str(len(nodes)))
            .replace("__E__", str(len(edges)))
            .replace("__LEGEND__", legend)
            .replace("__DATA__", json.dumps({"nodes": nodes, "edges": edges},
                                            ensure_ascii=False)))
    out = Path(args.out or Path(cfg.paths.graph_dir) / f"law_graph_{args.lang}.html")
    out.write_text(html, encoding="utf-8")
    log.info("wrote %s (%d nodes, %d edges)", out, len(nodes), len(edges))


if __name__ == "__main__":
    main()
