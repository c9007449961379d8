"""Interactive episode viewer: standalone HTML/canvas scrubber.

The reference ships a pygame window with zoom/pan keys
(``example/control/itscp/_viewer.py:13-123``) that cannot run headless.
dhts instead exports a single self-contained HTML file: the recorded
episode (lane geometry, per-step macro densities, vehicle positions,
signals) is embedded as JSON and rendered on a <canvas> with

* a time scrubber + play/pause (the pygame viewer has no timeline),
* mouse-wheel zoom and drag pan,
* macro lanes colored by density (white -> red, like ``CompLane.render``),
  micro vehicles as moving squares, signal state as a colored dot at the
  stop line.

Usage::

    from dhts.apps.control.itscp.viewer import export_html
    export_html(env, action, jax.random.PRNGKey(0), "episode.html")
"""

from __future__ import annotations

import json

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>dhts ITSCP episode</title>
<style>
 body {{ margin:0; background:#111; color:#ddd; font:13px sans-serif; }}
 #bar {{ padding:8px; display:flex; gap:10px; align-items:center; }}
 #cv {{ display:block; cursor:grab; }}
 input[type=range] {{ flex:1; }}
</style></head><body>
<div id="bar">
 <button id="play">&#9654;</button>
 <input type="range" id="t" min="0" max="0" value="0">
 <span id="lbl"></span>
</div>
<canvas id="cv"></canvas>
<script>
const D = {data};
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
const slider = document.getElementById('t'), lbl = document.getElementById('lbl');
const playBtn = document.getElementById('play');
slider.max = D.r.length - 1;
let view = {{x:0, y:0, k:1}}, playing = false, t = 0;
function fit() {{
  cv.width = innerWidth; cv.height = innerHeight - 50;
  const xs = D.seg.flatMap(s => [s[0][0], s[1][0]]);
  const ys = D.seg.flatMap(s => [s[0][1], s[1][1]]);
  const w = Math.max(...xs) - Math.min(...xs) + 20;
  const h = Math.max(...ys) - Math.min(...ys) + 20;
  view.k = Math.min(cv.width / w, cv.height / h);
  view.x = cv.width/2 - (Math.min(...xs) + Math.max(...xs))/2 * view.k;
  view.y = cv.height/2 - (Math.min(...ys) + Math.max(...ys))/2 * view.k;
}}
function draw() {{
  ctx.setTransform(1,0,0,1,0,0);
  ctx.fillStyle = '#111'; ctx.fillRect(0,0,cv.width,cv.height);
  ctx.setTransform(view.k,0,0,view.k,view.x,view.y);
  const lw = 2.5;
  for (let l = 0; l < D.seg.length; l++) {{
    const [a,b] = D.seg[l];
    const dx = b[0]-a[0], dy = b[1]-a[1];
    if (D.macro[l]) {{
      const nc = D.ncell[l];
      for (let c = 0; c < nc; c++) {{
        const r = D.r[t][l][c];
        const v = Math.max(0, 255 - Math.floor(r*255));
        ctx.strokeStyle = `rgb(255,${{v}},${{v}})`;
        ctx.lineWidth = lw;
        ctx.beginPath();
        ctx.moveTo(a[0]+dx*c/nc, a[1]+dy*c/nc);
        ctx.lineTo(a[0]+dx*(c+1)/nc, a[1]+dy*(c+1)/nc);
        ctx.stroke();
      }}
    }} else {{
      ctx.strokeStyle = '#3a3a46'; ctx.lineWidth = lw;
      ctx.beginPath(); ctx.moveTo(a[0],a[1]); ctx.lineTo(b[0],b[1]); ctx.stroke();
      const len = D.len[l];
      for (let v = 0; v < D.cnt[t][l]; v++) {{
        const f = Math.min(Math.max(D.pos[t][l][v]/len, 0), 1);
        ctx.fillStyle = '#4fc3f7';
        ctx.fillRect(a[0]+dx*f-1.5, a[1]+dy*f-1.5, 3, 3);
      }}
    }}
    if (D.app[l]) {{
      const s = D.sig[t][l];
      ctx.fillStyle = s > 0.5 ? '#46d160' : '#e33';
      ctx.beginPath(); ctx.arc(b[0], b[1], 1.6, 0, 7); ctx.fill();
    }}
  }}
  lbl.textContent = `step ${{t * D.every}} / ${{(D.r.length-1) * D.every}}`;
  slider.value = t;
}}
slider.oninput = () => {{ t = +slider.value; draw(); }};
playBtn.onclick = () => {{ playing = !playing; playBtn.innerHTML = playing ? '&#10074;&#10074;' : '&#9654;'; }};
setInterval(() => {{ if (playing) {{ t = (t+1) % D.r.length; draw(); }} }}, 80);
cv.onwheel = e => {{
  e.preventDefault();
  const f = e.deltaY < 0 ? 1.15 : 1/1.15;
  view.x = e.offsetX - (e.offsetX - view.x) * f;
  view.y = e.offsetY - (e.offsetY - view.y) * f;
  view.k *= f; draw();
}};
let drag = null;
cv.onmousedown = e => drag = [e.clientX - view.x, e.clientY - view.y];
cv.onmousemove = e => {{ if (drag) {{ view.x = e.clientX - drag[0]; view.y = e.clientY - drag[1]; draw(); }} }};
cv.onmouseup = () => drag = null;
onresize = () => {{ fit(); draw(); }};
fit(); draw();
</script></body></html>
"""


def export_html(env, action, key, path: str, every: int = 2) -> str:
    """Record a hard-mode episode and write a standalone HTML viewer.

    ``every``: keep every k-th simulation step (file-size control).
    Returns ``path``."""
    import jax

    from dhts.apps.control.itscp import env as env_mod

    if getattr(env, "_episode_rec", None) is None:
        env._episode_rec = jax.jit(env_mod._make_episode_fn(
            env.spec, env.meta, env.config, False, record=True))
    _, rec = env._episode_rec(np.asarray(action, np.float32), env.data,
                              env.base_state, key)
    rs, poss, counts, sigs, _, _ = (np.asarray(x) for x in rec)
    sel = slice(0, rs.shape[0], max(1, every))
    rnd = lambda a, d: np.round(a.astype(np.float64), d).tolist()
    data = dict(
        seg=rnd(np.asarray(env.grid.segments), 2),
        macro=np.asarray(env.spec.is_macro).astype(int).tolist(),
        app=np.asarray(env.meta.approaching).astype(int).tolist(),
        ncell=np.asarray(env.spec.num_cell).tolist(),
        len=rnd(np.asarray(env.spec.length), 2),
        r=rnd(rs[sel], 3),
        pos=rnd(poss[sel], 2),
        cnt=counts[sel].tolist(),
        sig=rnd(sigs[sel], 2),
        every=max(1, every),
    )
    html = _PAGE.format(data=json.dumps(data, separators=(",", ":")))
    with open(path, "w") as f:
        f.write(html)
    return path
