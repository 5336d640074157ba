"""The annotator's single-page UI (canvas 3-D viewer, no external deps)."""

PAGE_HTML = r"""<!doctype html>
<html>
<head>
<meta charset="utf-8"><title>flope-tpu pose annotator</title>
<style>
 body { font-family: sans-serif; margin: 0; display: flex; }
 #view { background: #111; cursor: grab; }
 #panel { padding: 12px; width: 300px; }
 button { margin: 2px; padding: 4px 8px; }
 .row { margin: 6px 0; }
 #log { color: #555; font-size: 12px; white-space: pre-wrap; }
</style>
</head>
<body>
<canvas id="view" width="900" height="700"></canvas>
<div id="panel">
  <h3>Pose annotator</h3>
  <div class="row">Pose: <select id="sel"></select>
    <button onclick="act({kind:'add'})">add</button>
    <button onclick="act({kind:'delete', index: selIdx()})">delete</button>
  </div>
  <div class="row">Translate (world):
    <div>
    X <button onclick="nudge('translate','x',1)">+</button><button onclick="nudge('translate','x',-1)">-</button>
    Y <button onclick="nudge('translate','y',1)">+</button><button onclick="nudge('translate','y',-1)">-</button>
    Z <button onclick="nudge('translate','z',1)">+</button><button onclick="nudge('translate','z',-1)">-</button>
    </div>
  </div>
  <div class="row">Rotate (local):
    <div>
    Rx <button onclick="nudge('rotate','x',1)">+</button><button onclick="nudge('rotate','x',-1)">-</button>
    Ry <button onclick="nudge('rotate','y',1)">+</button><button onclick="nudge('rotate','y',-1)">-</button>
    Rz <button onclick="nudge('rotate','z',1)">+</button><button onclick="nudge('rotate','z',-1)">-</button>
    </div>
  </div>
  <div class="row">dT: <span id="dt"></span>
    <button onclick="act({kind:'step_trans',sign:1})">x10</button>
    <button onclick="act({kind:'step_trans',sign:-1})">/10</button></div>
  <div class="row">dR: <span id="dr"></span>
    <button onclick="act({kind:'step_rot',sign:1})">x10</button>
    <button onclick="act({kind:'step_rot',sign:-1})">/10</button></div>
  <div class="row"><button onclick="act({kind:'save'})"><b>save</b></button></div>
  <div class="row">clicked: <span id="clicked"></span></div>
  <div id="log">drag = orbit, wheel = zoom, click = pick point</div>
</div>
<script>
let scene = {points: [], colors: [], poses: [], mask: []};
let yaw = 0.8, pitch = -0.5, dist = 2.5, cx = 0, cy = 0, cz = 0;
const cvs = document.getElementById('view');
const g = cvs.getContext('2d');

function selIdx() { return parseInt(document.getElementById('sel').value || 0); }

function camera() {
  const cp = Math.cos(pitch), sp = Math.sin(pitch);
  const cyw = Math.cos(yaw), sy = Math.sin(yaw);
  // rows of world->camera rotation
  return [[cyw, sy, 0], [-sy*sp, cyw*sp, cp], [sy*cp, -cyw*cp, sp]];
}

function project(p) {
  const R = camera();
  const x = p[0]-cx, y = p[1]-cy, z = p[2]-cz;
  const xc = R[0][0]*x + R[0][1]*y + R[0][2]*z;
  const yc = R[1][0]*x + R[1][1]*y + R[1][2]*z;
  const zc = R[2][0]*x + R[2][1]*y + R[2][2]*z + dist;
  if (zc <= 0.05) return null;
  const f = 600;
  return [cvs.width/2 + f*xc/zc, cvs.height/2 + f*yc/zc, zc];
}

function draw() {
  g.fillStyle = '#111'; g.fillRect(0, 0, cvs.width, cvs.height);
  for (let i = 0; i < scene.points.length; i++) {
    const q = project(scene.points[i]); if (!q) continue;
    const c = scene.colors[i] || [0.6, 0.6, 0.6];
    g.fillStyle = `rgb(${c[0]*255|0},${c[1]*255|0},${c[2]*255|0})`;
    g.fillRect(q[0], q[1], 2, 2);
  }
  const axisColors = ['#f44', '#4f4', '#48f'];
  scene.poses.forEach((T, i) => {
    if (!scene.mask[i]) return;
    const o = [T[0][3], T[1][3], T[2][3]];
    const po = project(o); if (!po) return;
    for (let a = 0; a < 3; a++) {
      const tip = [o[0]+0.05*T[0][a], o[1]+0.05*T[1][a], o[2]+0.05*T[2][a]];
      const pt = project(tip); if (!pt) continue;
      g.strokeStyle = axisColors[a];
      g.lineWidth = (i === selIdx()) ? 3 : 1.5;
      g.beginPath(); g.moveTo(po[0], po[1]); g.lineTo(pt[0], pt[1]); g.stroke();
    }
    g.fillStyle = (i === selIdx()) ? '#ff0' : '#aaa';
    g.fillText(String(i), po[0]+4, po[1]-4);
  });
}

function refreshUI() {
  const sel = document.getElementById('sel');
  const cur = sel.value;
  sel.innerHTML = '';
  scene.poses.forEach((_, i) => {
    if (!scene.mask[i]) return;
    const o = document.createElement('option');
    o.value = i; o.textContent = i; sel.appendChild(o);
  });
  if ([...sel.options].some(o => o.value === cur)) sel.value = cur;
  document.getElementById('dt').textContent = scene.delta_trans;
  document.getElementById('dr').textContent = scene.delta_rot;
  document.getElementById('clicked').textContent =
    scene.clicked.map(v => v.toFixed(3)).join(', ');
  draw();
}

async function act(a) {
  const r = await fetch('/action', {method: 'POST', body: JSON.stringify(a)});
  const s = await r.json();
  Object.assign(scene, s);
  if (s.saved) document.getElementById('log').textContent =
    `saved ${s.count} poses to ${s.saved}`;
  refreshUI();
}
function nudge(kind, axis, sign) { act({kind, axis, sign, index: selIdx()}); }

let dragging = false, lx = 0, ly = 0;
cvs.onmousedown = e => { dragging = true; lx = e.offsetX; ly = e.offsetY; };
cvs.onmouseup = e => {
  dragging = false;
  if (Math.abs(e.offsetX-lx) < 3 && Math.abs(e.offsetY-ly) < 3) pick(e);
};
cvs.onmousemove = e => {
  if (!dragging) return;
  yaw += (e.offsetX - lx) * 0.01; pitch += (e.offsetY - ly) * 0.01;
  lx = e.offsetX; ly = e.offsetY; draw();
};
cvs.onwheel = e => { dist *= e.deltaY > 0 ? 1.1 : 0.9; draw(); e.preventDefault(); };

function pick(e) {
  let best = null, bd = 100;
  for (const p of scene.points) {
    const q = project(p); if (!q) continue;
    const d = (q[0]-e.offsetX)**2 + (q[1]-e.offsetY)**2;
    if (d < bd) { bd = d; best = p; }
  }
  if (best) act({kind: 'click', point: best});
}

fetch('/scene').then(r => r.json()).then(s => { scene = s; refreshUI(); });
</script>
</body>
</html>
"""
