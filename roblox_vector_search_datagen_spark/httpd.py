"""Thin HTTP transport over the ApiService handler registry — the
Express-server analog (reference src/api.ts:7-64, port 3705). The
engine's contract remains the handler surface in `api.py`; this module
only does socket plumbing: route match (including `:param` segments),
query-string decoding, JSON responses, and ApiError -> HTTP status.

stdlib-only (ThreadingHTTPServer) so the mount exists everywhere the
engine does; a production deployment can mount the same ENDPOINTS dict
under any ASGI/WSGI framework instead.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .api import ApiError, ApiService

DEFAULT_PORT = 3705  # reference src/api.ts:62

def _match(template: str, path: str) -> dict[str, str] | None:
    """Match '/similar-search/:universeId' against a concrete path,
    returning captured params (the S18 route-pattern analog)."""
    t_parts = template.strip("/").split("/")
    p_parts = path.strip("/").split("/")
    if len(t_parts) != len(p_parts):
        return None
    params: dict[str, str] = {}
    for t, p in zip(t_parts, p_parts):
        if t.startswith(":"):
            params[t[1:]] = p
        elif t != p:
            return None
    return params

# Self-contained API docs page served at /docs (src/api.ts:58-59).
# Fetches the live /openapi.json and renders each path/method with its
# summary and parameter table — no CDN scripts, no bundled assets.
_DOCS_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>API docs</title>
<style>
 body{font-family:sans-serif;max-width:60em;margin:2em auto;padding:0 1em}
 .op{border:1px solid #ccc;border-radius:4px;margin:.6em 0;padding:.6em 1em}
 .m{display:inline-block;font-weight:bold;width:4em}
 code{background:#f4f4f4;padding:0 .2em}
 table{border-collapse:collapse;margin:.4em 0}
 td,th{border:1px solid #ddd;padding:.2em .5em;font-size:.9em;text-align:left}
</style></head><body>
<h1 id="t">API docs</h1><div id="ops">loading /openapi.json…</div>
<script>
fetch('/openapi.json').then(r=>r.json()).then(spec=>{
 // every spec-derived string is HTML-escaped before innerHTML
 // interpolation — the spec is server-generated today, but a docs
 // renderer must not be the place that trusts it
 const esc=s=>String(s).replace(/[&<>"']/g,
   c=>({'&':'&amp;','<':'&lt;','>':'&gt;','"':'&quot;',"'":'&#39;'}[c]));
 document.getElementById('t').textContent=
   (spec.info&&spec.info.title||'API')+' '+(spec.info&&spec.info.version||'');
 const out=[];
 for(const [path,methods] of Object.entries(spec.paths||{})){
  for(const [method,op] of Object.entries(methods)){
   const params=(op.parameters||[]).map(p=>
    `<tr><td><code>${esc(p.name)}</code></td><td>${esc(p.in)}</td>`+
    `<td>${p.required?'yes':'no'}</td>`+
    `<td>${esc((p.schema&&p.schema.type)||'')}</td></tr>`).join('');
   out.push(`<div class="op"><span class="m">${esc(method.toUpperCase())}</span>`+
    `<code>${esc(path)}</code><p>${esc(op.summary||'')}</p>`+
    (params?`<table><tr><th>param</th><th>in</th><th>required</th>`+
      `<th>type</th></tr>${params}</table>`:'')+`</div>`);
  }
 }
 document.getElementById('ops').innerHTML=out.join('')||'no paths';
});
</script></body></html>
"""

# route-param name -> handler kwarg name
_PARAM_KWARGS = {"universeId": "universe_id", "id": "job_id"}
# query params each handler accepts (everything else is ignored, like
# Express's req.query destructuring)
_QUERY_KWARGS = ("q", "limit", "offset")

class _Handler(BaseHTTPRequestHandler):
    service: ApiService  # set by serve()

    def _dispatch(self, method: str) -> None:
        url = urlparse(self.path)
        if method == "GET" and url.path == "/openapi.json":
            self._send(200, self.service.openapi_spec())
            return
        if method == "GET" and url.path == "/docs":
            # interactive docs route (reference src/api.ts:58-59 mounts
            # swagger-ui-express at /docs). No bundled swagger-ui assets
            # here, so serve a self-contained page that fetches
            # /openapi.json and renders the operation list client-side —
            # zero external requests, works air-gapped.
            self._send_html(200, _DOCS_HTML)
            return
        query = {k: v[0] for k, v in parse_qs(url.query).items()}
        for (m, template), fn in self.service.endpoints.items():
            if m != method:
                continue
            params = _match(template, url.path)
            if params is None:
                continue
            kwargs: dict[str, object] = {
                _PARAM_KWARGS.get(k, k): v for k, v in params.items()
            }
            kwargs.update({k: query[k] for k in _QUERY_KWARGS if k in query})
            try:
                self._send(200, fn(**kwargs))
            except ApiError as e:
                self._send(e.status, {"error": str(e)})
            except (TypeError, ValueError) as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — 500 like src/api.ts:32-41
                self._send(500, {"error": str(e)})
            return
        self._send(404, {"error": f"no route for {method} {url.path}"})

    def _send_html(self, status: int, html: str) -> None:
        data = html.encode()
        self.send_response(status)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _send(self, status: int, body: object) -> None:
        data = json.dumps(body).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self) -> None:  # noqa: N802 — BaseHTTPRequestHandler API
        self._dispatch("GET")

    def do_POST(self) -> None:  # noqa: N802
        self._dispatch("POST")

    def log_message(self, *args) -> None:  # quiet by default
        pass

def serve(service: ApiService, port: int = DEFAULT_PORT, host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """Bind and serve in a daemon thread; returns the server (call
    .shutdown() to stop). Port 0 picks a free port (tests)."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    server = ThreadingHTTPServer((host, port), handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
