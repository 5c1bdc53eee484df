package graft.api

/** Browser control page served by [[RestServer]] at `GET /` — the Spark
  * re-expression of the reference's static control page (frontend.html:1-284:
  * stage list + run button + live result + output-file viewer against the
  * Flask API). Original markup, same capabilities; uses relative URLs so it
  * works on whatever host/port the server binds (the reference hardcodes
  * 127.0.0.1:5000).
  */
object Ui {

  val indexHtml: String =
    """<!DOCTYPE html>
      |<html lang="en">
      |<head>
      |<meta charset="utf-8">
      |<title>graft pipeline console</title>
      |<style>
      |  body { font-family: system-ui, sans-serif; background: #14171f;
      |         color: #d6dbe5; margin: 0; }
      |  main { max-width: 640px; margin: 40px auto; background: #1d2230;
      |         border-radius: 10px; padding: 28px; }
      |  h1 { font-size: 1.3rem; color: #8fd0ff; margin-top: 0; }
      |  select, button { font-size: 1rem; border-radius: 5px; padding: 8px; }
      |  select { width: 100%; background: #14171f; color: #d6dbe5;
      |           border: 1px solid #39415a; margin-bottom: 12px; }
      |  button { background: #2f7fd1; color: #fff; border: 0;
      |           cursor: pointer; padding: 8px 18px; }
      |  button:disabled { background: #39415a; cursor: wait; }
      |  pre { background: #0e1118; padding: 12px; border-radius: 5px;
      |        overflow: auto; max-height: 320px; white-space: pre-wrap; }
      |  .ok { color: #9fdf9f; } .err { color: #ff7b7b; }
      |  .file { cursor: pointer; padding: 5px 9px; margin: 3px 0;
      |          background: #171b26; border: 1px solid #39415a;
      |          border-radius: 4px; }
      |  .muted { color: #8b93a7; font-size: 0.9rem; }
      |</style>
      |</head>
      |<body>
      |<main>
      |  <h1>graft pipeline console</h1>
      |  <label for="stage">Stage</label>
      |  <select id="stage"></select>
      |  <button id="run" onclick="runStage()">Run</button>
      |  <div id="status" class="muted"></div>
      |  <pre id="log" style="display:none"></pre>
      |  <h1 style="font-size:1.05rem">Output files</h1>
      |  <div id="files" class="muted">none yet</div>
      |  <pre id="view" style="display:none"></pre>
      |</main>
      |<script>
      |async function loadStages() {
      |  const names = await (await fetch('stages')).json();
      |  const sel = document.getElementById('stage');
      |  sel.innerHTML = '';
      |  for (const n of names) {
      |    const o = document.createElement('option');
      |    o.value = o.textContent = n;
      |    sel.appendChild(o);
      |  }
      |}
      |async function runStage() {
      |  const btn = document.getElementById('run');
      |  const status = document.getElementById('status');
      |  const log = document.getElementById('log');
      |  btn.disabled = true;
      |  status.textContent = 'running…';
      |  log.style.display = 'none';
      |  try {
      |    const stage = document.getElementById('stage').value;
      |    const res = await fetch('run', { method: 'POST',
      |      headers: { 'Content-Type': 'application/json' },
      |      body: JSON.stringify({ stage }) });
      |    const d = await res.json();
      |    // error answers (400 unknown stage, 405) carry no seconds field —
      |    // suppress the duration clause instead of rendering "after NaN s"
      |    const secs = Number.isFinite(Number(d.seconds))
      |      ? ' after ' + Number(d.seconds).toFixed(2) + ' s' : '';
      |    status.innerHTML = d.ok
      |      ? '<span class="ok">ok</span> in ' + Number(d.seconds).toFixed(2) + ' s'
      |      : '<span class="err">' + (d.timedOut ? 'timed out' : 'failed')
      |        + '</span>' + secs;
      |    log.textContent = d.log || d.error || '';
      |    log.style.display = 'block';
      |  } catch (e) {
      |    status.innerHTML = '<span class="err">' + e.message + '</span>';
      |  }
      |  btn.disabled = false;
      |  await loadFiles();
      |}
      |async function loadFiles() {
      |  // backend_api.py shapes: {"files":[...]} / {"content":"..."}
      |  const files = (await (await fetch('output-files')).json()).files;
      |  const div = document.getElementById('files');
      |  div.innerHTML = files.length ? '' : 'none yet';
      |  for (const f of files) {
      |    const d = document.createElement('div');
      |    d.className = 'file';
      |    d.textContent = f;
      |    d.onclick = async () => {
      |      const view = document.getElementById('view');
      |      view.textContent =
      |        (await (await fetch('output/' + encodeURIComponent(f))).json())
      |          .content;
      |      view.style.display = 'block';
      |    };
      |    div.appendChild(d);
      |  }
      |}
      |loadStages().then(loadFiles).catch(e => {
      |  const status = document.getElementById('status');
      |  status.innerHTML = '<span class="err">load failed: ' + e.message
      |    + ' — reload to retry</span>';
      |});
      |</script>
      |</body>
      |</html>
      |""".stripMargin
}
