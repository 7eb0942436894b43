"""Single-file web UI for the editing server.

Replaces the reference's gradio frontend (`examples/app.py`,
`videox_fun/ui/wan_ui.py`) with a dependency-free page served by the stdlib
HTTP server: upload a clip, type the edit instruction, tune
steps/guidance/seed, and view the reason+edit result inline. Talks to the
same JSON endpoint as programmatic clients.
"""

INDEX_HTML = """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>VideoCoF-TPU — chain-of-frames video editing</title>
<style>
  :root { color-scheme: dark; }
  body { font-family: system-ui, sans-serif; background: #111; color: #eee;
         max-width: 880px; margin: 2rem auto; padding: 0 1rem; }
  h1 { font-size: 1.4rem; } h1 span { color: #7ac; }
  fieldset { border: 1px solid #333; border-radius: 8px; margin: 1rem 0;
             padding: 1rem; }
  label { display: block; margin: .6rem 0 .2rem; font-size: .9rem;
          color: #aaa; }
  input[type=text], input[type=number], select {
      width: 100%; padding: .45rem; background: #1a1a1a; color: #eee;
      border: 1px solid #444; border-radius: 6px; }
  .row { display: grid; grid-template-columns: repeat(4, 1fr); gap: .8rem; }
  button { margin-top: 1rem; padding: .6rem 1.6rem; font-size: 1rem;
           background: #2a6; border: 0; border-radius: 6px; color: #fff;
           cursor: pointer; }
  button:disabled { background: #444; }
  video { width: 100%; margin-top: 1rem; border-radius: 8px; }
  #status { margin-top: 1rem; color: #7ac; white-space: pre-wrap; }
</style>
</head>
<body>
<h1><span>VideoCoF-TPU</span> — see &rarr; reason &rarr; edit</h1>
<fieldset>
  <label>Source video (mp4)</label>
  <input type="file" id="video" accept="video/mp4">
  <label>Edit instruction</label>
  <input type="text" id="prompt"
         placeholder="remove the dog / replace the car with a boat / ...">
  <div class="row">
    <div><label>Steps</label>
      <input type="number" id="steps" value="4" min="1" max="50"></div>
    <div><label>Guidance</label>
      <input type="number" id="cfg" value="1.0" step="0.5"></div>
    <div><label>Seed</label>
      <input type="number" id="seed" value="0"></div>
    <div><label>Source frames</label>
      <input type="number" id="frames" value="33"></div>
  </div>
  <button id="go">Edit video</button>
</fieldset>
<div id="status"></div>
<video id="out" controls style="display:none"></video>
<script>
const $ = (id) => document.getElementById(id);
$("go").onclick = async () => {
  const f = $("video").files[0];
  if (!f) { $("status").textContent = "pick a video first"; return; }
  if (!$("prompt").value) { $("status").textContent = "type an instruction"; return; }
  $("go").disabled = true;
  $("status").textContent = "uploading + generating (first call compiles; be patient)...";
  const buf = await f.arrayBuffer();
  const b64 = btoa(String.fromCharCode(...new Uint8Array(buf)));
  const t0 = performance.now();
  try {
    const r = await fetch("/videocof/infer_forward", {
      method: "POST", headers: {"Content-Type": "application/json"},
      body: JSON.stringify({
        prompt_textbox: $("prompt").value,
        source_video: b64,
        seed_textbox: +$("seed").value,
        sample_step_slider: +$("steps").value,
        cfg_scale_slider: +$("cfg").value,
        source_frames: +$("frames").value,
      })});
    const j = await r.json();
    if (j.message !== "Success") throw new Error(j.message);
    const dt = ((performance.now() - t0) / 1000).toFixed(1);
    $("status").textContent = `done in ${dt}s\\nprompt: ${j.prompt}`;
    const v = $("out");
    v.src = "data:video/mp4;base64," + j.base64_encoding;
    v.style.display = "block";
  } catch (e) {
    $("status").textContent = "error: " + e;
  } finally {
    $("go").disabled = false;
  }
};
</script>
</body>
</html>
"""
