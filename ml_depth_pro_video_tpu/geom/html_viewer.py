"""Self-contained interactive HTML point-cloud viewer.

Capability parity with the reference's interactive Open3D windows
(`img_to_normalized_pointcloud.py:38-223` onscreen path and
`OLD_SCRIPTS/video3D.py:70-78` `draw_geometries` viewer): on a headless
TPU host we cannot open a GL window, so instead we emit ONE dependency-
free HTML file with the point cloud embedded (base64 float32/uint8) and
a hand-written WebGL orbit viewer — it opens offline in any browser,
with left-drag rotate, wheel zoom, and right-drag pan.

The file is fully self-contained: no CDN, no three.js, no network.
"""

from __future__ import annotations

import base64
import html as _html

import numpy as np

from .pointcloud import PointCloud

# ---------------------------------------------------------------------------
# the embedded viewer: minimal WebGL1 + orbit controls, ~150 lines of JS

_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>__TITLE__</title>
<style>
  html, body { margin: 0; height: 100%; overflow: hidden; background: #111; }
  #c { width: 100%; height: 100%; display: block; }
  #hud { position: fixed; top: 8px; left: 10px; color: #ccc;
         font: 12px monospace; user-select: none; }
</style>
</head>
<body>
<canvas id="c"></canvas>
<div id="hud">__TITLE__ &middot; __NPTS__ points &middot;
  drag: rotate &middot; wheel: zoom &middot; right-drag: pan</div>
<script>
"use strict";
const POS_B64 = "__POS__";
const COL_B64 = "__COL__";
const N = __NPTS__;
const CENTER = __CENTER__;
const RADIUS = __RADIUS__;
const POINT_SIZE = __PSIZE__;

function b64ToBytes(s) {
  const bin = atob(s), out = new Uint8Array(bin.length);
  for (let i = 0; i < bin.length; i++) out[i] = bin.charCodeAt(i);
  return out;
}
const positions = new Float32Array(b64ToBytes(POS_B64).buffer);
const colors = b64ToBytes(COL_B64);

const canvas = document.getElementById("c");
const gl = canvas.getContext("webgl", { antialias: true });

const VS = `
attribute vec3 aPos; attribute vec3 aCol;
uniform mat4 uMVP; uniform float uSize;
varying vec3 vCol;
void main() {
  gl_Position = uMVP * vec4(aPos, 1.0);
  gl_PointSize = uSize;
  vCol = aCol;
}`;
const FS = `
precision mediump float; varying vec3 vCol;
void main() { gl_FragColor = vec4(vCol, 1.0); }`;

function shader(type, src) {
  const s = gl.createShader(type);
  gl.shaderSource(s, src); gl.compileShader(s);
  return s;
}
const prog = gl.createProgram();
gl.attachShader(prog, shader(gl.VERTEX_SHADER, VS));
gl.attachShader(prog, shader(gl.FRAGMENT_SHADER, FS));
gl.linkProgram(prog); gl.useProgram(prog);

function attr(name, data, normalize) {
  const buf = gl.createBuffer();
  gl.bindBuffer(gl.ARRAY_BUFFER, buf);
  gl.bufferData(gl.ARRAY_BUFFER, data, gl.STATIC_DRAW);
  const loc = gl.getAttribLocation(prog, name);
  gl.enableVertexAttribArray(loc);
  gl.vertexAttribPointer(loc, 3,
    normalize ? gl.UNSIGNED_BYTE : gl.FLOAT, normalize, 0, 0);
}
attr("aPos", positions, false);
attr("aCol", colors, true);
const uMVP = gl.getUniformLocation(prog, "uMVP");
const uSize = gl.getUniformLocation(prog, "uSize");

// --- tiny mat4 helpers (column-major) ---
function perspective(fovy, aspect, near, far) {
  const f = 1 / Math.tan(fovy / 2), nf = 1 / (near - far);
  return [f / aspect, 0, 0, 0,  0, f, 0, 0,
          0, 0, (far + near) * nf, -1,  0, 0, 2 * far * near * nf, 0];
}
function mul(a, b) {
  const o = new Array(16).fill(0);
  for (let c = 0; c < 4; c++)
    for (let r = 0; r < 4; r++)
      for (let k = 0; k < 4; k++)
        o[c * 4 + r] += a[k * 4 + r] * b[c * 4 + k];
  return o;
}
function lookAtOrbit(az, el, dist, target, panX, panY) {
  // camera orbiting target; Y-up world (geometry convention)
  const ce = Math.cos(el), se = Math.sin(el);
  const ca = Math.cos(az), sa = Math.sin(az);
  const eye = [target[0] + dist * ce * sa,
               target[1] + dist * se,
               target[2] + dist * ce * ca];
  // basis
  let fwd = [target[0] - eye[0], target[1] - eye[1], target[2] - eye[2]];
  const fl = Math.hypot(fwd[0], fwd[1], fwd[2]);
  fwd = fwd.map(v => v / fl);
  const upW = [0, 1, 0];
  let right = [fwd[1] * upW[2] - fwd[2] * upW[1],
               fwd[2] * upW[0] - fwd[0] * upW[2],
               fwd[0] * upW[1] - fwd[1] * upW[0]];
  const rl = Math.hypot(right[0], right[1], right[2]) || 1;
  right = right.map(v => v / rl);
  const up = [right[1] * fwd[2] - right[2] * fwd[1],
              right[2] * fwd[0] - right[0] * fwd[2],
              right[0] * fwd[1] - right[1] * fwd[0]];
  // apply pan in camera plane
  const px = panX, py = panY;
  const t = [target[0] + right[0] * px + up[0] * py,
             target[1] + right[1] * px + up[1] * py,
             target[2] + right[2] * px + up[2] * py];
  const e = [eye[0] + right[0] * px + up[0] * py,
             eye[1] + right[1] * px + up[1] * py,
             eye[2] + right[2] * px + up[2] * py];
  return [
    right[0], up[0], -fwd[0], 0,
    right[1], up[1], -fwd[1], 0,
    right[2], up[2], -fwd[2], 0,
    -(right[0] * e[0] + right[1] * e[1] + right[2] * e[2]),
    -(up[0] * e[0] + up[1] * e[1] + up[2] * e[2]),
    (fwd[0] * e[0] + fwd[1] * e[1] + fwd[2] * e[2]), 1];
}

let az = 0.6, el = 0.35, dist = RADIUS * 2.5, panX = 0, panY = 0;
let dragging = 0, lastX = 0, lastY = 0;
canvas.addEventListener("contextmenu", e => e.preventDefault());
canvas.addEventListener("mousedown", e => {
  dragging = e.button === 2 ? 2 : 1; lastX = e.clientX; lastY = e.clientY;
});
window.addEventListener("mouseup", () => dragging = 0);
window.addEventListener("mousemove", e => {
  if (!dragging) return;
  const dx = e.clientX - lastX, dy = e.clientY - lastY;
  lastX = e.clientX; lastY = e.clientY;
  if (dragging === 1) {
    az -= dx * 0.006;
    el = Math.max(-1.55, Math.min(1.55, el + dy * 0.006));
  } else {
    panX -= dx * dist * 0.0012; panY += dy * dist * 0.0012;
  }
  draw();
});
canvas.addEventListener("wheel", e => {
  e.preventDefault();
  dist *= Math.exp(e.deltaY * 0.001);
  dist = Math.max(RADIUS * 0.05, Math.min(RADIUS * 40, dist));
  draw();
}, { passive: false });

function draw() {
  const w = canvas.clientWidth, h = canvas.clientHeight;
  if (canvas.width !== w || canvas.height !== h) {
    canvas.width = w; canvas.height = h;
    gl.viewport(0, 0, w, h);
  }
  gl.clearColor(0.066, 0.066, 0.066, 1);
  gl.enable(gl.DEPTH_TEST);
  gl.clear(gl.COLOR_BUFFER_BIT | gl.DEPTH_BUFFER_BIT);
  const proj = perspective(0.9, w / h, RADIUS * 0.01, RADIUS * 100);
  const view = lookAtOrbit(az, el, dist, CENTER, panX, panY);
  gl.uniformMatrix4fv(uMVP, false, new Float32Array(mul(proj, view)));
  gl.uniform1f(uSize, POINT_SIZE);
  gl.drawArrays(gl.POINTS, 0, N);
}
window.addEventListener("resize", draw);
draw();
</script>
</body>
</html>
"""


def export_html(
    cloud: PointCloud,
    path: str,
    title: str = "Point cloud",
    max_points: int = 1_000_000,
    point_size: float = 2.0,
    seed: int = 0,
) -> str:
    """Write a self-contained interactive HTML viewer for ``cloud``.

    Points above ``max_points`` are uniformly subsampled (seeded) to
    bound the file size (~16 bytes/point in base64). Returns ``path``.
    """
    pts = np.asarray(cloud.points, dtype=np.float32)
    colors = cloud.colors
    if len(pts) > max_points:
        idx = np.random.default_rng(seed).choice(
            len(pts), size=max_points, replace=False)
        idx.sort()
        pts = pts[idx]
        colors = None if colors is None else colors[idx]
    n = len(pts)

    if colors is None:
        # height-colored fallback (viridis-ish two-ramp), like the
        # reference's uncolored-cloud renders
        y = pts[:, 1] if n else np.zeros(0, np.float32)
        lo, hi = (y.min(), y.max()) if n else (0.0, 1.0)
        t = (y - lo) / (hi - lo) if hi > lo else np.zeros_like(y)
        col8 = np.stack([
            np.clip(255 * (0.28 + 0.7 * t), 0, 255),
            np.clip(255 * (0.1 + 0.8 * t), 0, 255),
            np.clip(255 * (0.55 - 0.4 * t), 0, 255),
        ], axis=1).astype(np.uint8)
    else:
        c = np.asarray(colors)
        col8 = (np.clip(c, 0, 1) * 255).astype(np.uint8) if c.dtype.kind == "f" \
            else np.clip(c, 0, 255).astype(np.uint8)

    center = pts.mean(axis=0) if n else np.zeros(3, np.float32)
    radius = float(np.linalg.norm(pts - center, axis=1).max()) if n else 1.0
    radius = max(radius, 1e-3)

    doc = (
        _TEMPLATE
        .replace("__TITLE__", _html.escape(title))
        .replace("__NPTS__", str(n))
        .replace("__POS__", base64.b64encode(np.ascontiguousarray(pts).tobytes()).decode())
        .replace("__COL__", base64.b64encode(np.ascontiguousarray(col8).tobytes()).decode())
        .replace("__CENTER__", "[%.6g, %.6g, %.6g]" % tuple(center))
        .replace("__RADIUS__", "%.6g" % radius)
        .replace("__PSIZE__", "%.3g" % point_size)
    )
    with open(path, "w") as f:
        f.write(doc)
    return path
