"""Long-running HTTP service: the reference's Akka server surface
(http:Main.scala:35-72, service/Task.scala, service/Workspace.scala,
service/Cache.scala) on the Python stdlib ``ThreadingHTTPServer``.

Route parity (all under ``/api`` like Main.scala:46):

  POST   /api/task            submit a JSON task pipeline -> 202 +
                              ``Location: /api/task/{id}`` + InProgress body
                              (Task.scala:38-48)
  GET    /api/task/{id}       202 InProgress {id, started, messages} while
                              running; 200 Result {id, started, finished,
                              messages, result: [...]} once — the task is
                              then forgotten, a second GET is 404
                              (Task.scala:50-63: Behaviors.stopped after
                              the result is handed out); failures are 500
  DELETE /api/task/{id}       interrupt -> 202 "accepted" (Task.scala:64-66;
                              interrupt = Spark cancelJobGroup, the cluster
                              analog of Debugger.interrupt())
  GET    /api/workspace       file tree {name, type, size, writable}
  GET    /api/workspace/{p}   file download (octet-stream)
  POST   /api/workspace       multipart upload (fields ``directory`` then
                              ``file``, Workspace.scala:28-50); JSON
                              {directory, filename, content} also accepted
  DELETE /api/workspace/{p}   delete if writable
  GET    /api/cache           memory info {total, free, itemsInCache}
  POST   /api/cache/{id}      alias a cached item (form field ``alias``)
  DELETE /api/cache/{id}      unpersist one item; /api/cache/clear clears

Every response carries the MemoryCache-Total/Free/Items headers
(Main.scala:43-45).

Execution model: one task = one daemon ``pyspark.InheritableThread``
running ``run_pipeline_json`` under a per-task Spark job group with
``interruptOnCancel=True`` — DELETE cancels the group, which kills the
task's running Spark jobs (pinned-thread mode makes the job group
thread-local, so concurrent tasks cancel independently). Results stream
to the client via ``toLocalIterator`` with the reference's JSON framing
(header + ``"result": [`` + rows + ``]}``, Task.scala:55-60) — the driver
never holds the full result row list. Tasks idle longer than
``idle_timeout_s`` without a poll are cancelled and dropped
(Task.scala:122 setReceiveTimeout 10 minutes).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import uuid
from email.parser import BytesParser
from email.policy import default as email_default_policy
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark import InheritableThread
from pyspark.sql import SparkSession

_TASK_STATES = ("running", "done", "failed", "interrupted")


def _now_iso() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


class _Task:
    def __init__(self, task_id: str, spark: SparkSession, tasks_json: list):
        self.id = task_id
        self.spark = spark
        self.tasks_json = tasks_json
        self.started = _now_iso()
        self.finished: str | None = None
        self.state = "running"
        self.messages: list[dict] = []
        self.result_df = None
        self.error: str | None = None
        self.last_touch = time.time()
        self.lock = threading.Lock()
        self.group = f"http-task-{task_id}"
        self.thread = InheritableThread(target=self._run, daemon=True)

    def log(self, msg: str) -> None:
        with self.lock:
            self.messages.append({"message": msg, "date": _now_iso()})

    def _run(self) -> None:
        from rdfrules_spark.http_pipeline import run_pipeline_json

        sc = self.spark.sparkContext
        sc.setJobGroup(self.group, f"http task {self.id}",
                       interruptOnCancel=True)
        try:
            self.log(f"pipeline accepted: {len(self.tasks_json)} tasks")
            df = run_pipeline_json(self.spark, self.tasks_json)
            self.log("logical plan built; materializing result")
            # force execution INSIDE the job group / task thread so DELETE
            # can kill it; the terminal task bounds the row count
            df = df.localCheckpoint(eager=True)
            with self.lock:
                # a DELETE may have flipped state to "interrupted" while
                # the Spark jobs raced to completion — keep that verdict
                if self.state == "running":
                    self.result_df = df
                    self.state = "done"
                self.finished = _now_iso()
            self.log("result materialized")
        except Exception as e:  # noqa: BLE001 — reported to the client
            with self.lock:
                if self.state == "running":
                    self.state = "failed"
                self.error = f"{type(e).__name__}: {e}"
                self.finished = _now_iso()

    def interrupt(self) -> None:
        with self.lock:
            if self.state == "running":
                self.state = "interrupted"
        self.spark.sparkContext.cancelJobGroup(self.group)


class TaskServer:
    """The long-running service process (reference ``runHttp``)."""

    def __init__(
        self,
        spark: SparkSession,
        workspace_dir: str,
        host: str = "127.0.0.1",
        port: int = 8851,
        idle_timeout_s: float = 600.0,
    ):
        self.spark = spark
        self.workspace_dir = os.path.abspath(workspace_dir)
        os.makedirs(self.workspace_dir, exist_ok=True)
        self.idle_timeout_s = idle_timeout_s
        self.tasks: dict[str, _Task] = {}
        self.tasks_lock = threading.Lock()
        handler = _make_handler(self)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.httpd.daemon_threads = True
        self._serve_thread: threading.Thread | None = None

    # ------------------------------------------------------------ lifecycle

    @property
    def url(self) -> str:
        h, p = self.httpd.server_address[:2]
        return f"http://{h}:{p}"

    def start(self) -> "TaskServer":
        self._serve_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._serve_thread.start()
        # autonomous idle sweeper (Task.scala setReceiveTimeout fires
        # without traffic; purging only on request would let an abandoned
        # task's Spark jobs run forever on a quiet server)
        self._stop_sweeper = threading.Event()

        def sweep():
            period = max(1.0, min(60.0, self.idle_timeout_s / 4))
            while not self._stop_sweeper.wait(period):
                self._purge_idle()

        self._sweeper = threading.Thread(target=sweep, daemon=True)
        self._sweeper.start()
        return self

    def stop(self) -> None:
        if getattr(self, "_stop_sweeper", None) is not None:
            self._stop_sweeper.set()
        self.httpd.shutdown()
        self.httpd.server_close()
        with self.tasks_lock:
            for t in self.tasks.values():
                if t.state == "running":
                    t.interrupt()
            self.tasks.clear()

    # ---------------------------------------------------------------- tasks

    def submit(self, tasks_json: list) -> _Task:
        self._purge_idle()
        t = _Task(uuid.uuid4().hex, self.spark, tasks_json)
        with self.tasks_lock:
            self.tasks[t.id] = t
        t.thread.start()
        return t

    def get_task(self, task_id: str) -> _Task | None:
        self._purge_idle()
        with self.tasks_lock:
            t = self.tasks.get(task_id)
        if t is not None:
            t.last_touch = time.time()
        return t

    def forget(self, task_id: str) -> None:
        with self.tasks_lock:
            self.tasks.pop(task_id, None)

    def _purge_idle(self) -> None:
        cutoff = time.time() - self.idle_timeout_s
        with self.tasks_lock:
            stale = [
                i for i, t in self.tasks.items() if t.last_touch < cutoff
            ]
            for i in stale:
                t = self.tasks.pop(i)
                if t.state == "running":
                    t.interrupt()

    # ---------------------------------------------------------- cache info

    def memory_info(self) -> dict:
        rt = None
        try:
            rt = self.spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
            total, free = rt.totalMemory(), rt.freeMemory()
        except Exception:  # noqa: BLE001 — JVM gateway variance
            total = free = 0
        try:
            items = self.spark.sparkContext._jsc.getPersistentRDDs().size()
        except Exception:  # noqa: BLE001
            items = 0
        return {"total": total, "free": free, "itemsInCache": items}

    # ----------------------------------------------------------- workspace

    def ws_path(self, rel: str) -> str:
        p = os.path.abspath(os.path.join(self.workspace_dir, rel))
        if not (p + os.sep).startswith(self.workspace_dir + os.sep) and \
                p != self.workspace_dir:
            raise PermissionError(f"path escapes the workspace: {rel}")
        return p

    def ws_tree(self, root: str | None = None) -> dict:
        root = root or self.workspace_dir
        name = os.path.basename(root.rstrip(os.sep)) or "workspace"
        if os.path.isdir(root):
            return {
                "name": name,
                "type": "directory",
                "writable": os.access(root, os.W_OK),
                "subfiles": [
                    self.ws_tree(os.path.join(root, fn))
                    for fn in sorted(os.listdir(root))
                ],
            }
        return {
            "name": name,
            "type": "file",
            "size": os.path.getsize(root),
            "writable": os.access(root, os.W_OK),
        }


def _make_handler(server: TaskServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        # silence per-request stderr logging
        def log_message(self, fmt, *args):  # noqa: ARG002
            pass

        # ------------------------------------------------------- plumbing

        def _headers(self, extra: dict | None = None) -> dict:
            mi = server.memory_info()
            h = {
                "MemoryCache-Total": str(mi["total"]),
                "MemoryCache-Free": str(mi["free"]),
                "MemoryCache-Items": str(mi["itemsInCache"]),
            }
            h.update(extra or {})
            return h

        def _send(self, code: int, body: bytes,
                  ctype: str = "application/json",
                  extra: dict | None = None) -> None:
            self.send_response(code)
            for k, v in self._headers(extra).items():
                self.send_header(k, v)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj,
                       extra: dict | None = None) -> None:
            self._send(code, json.dumps(obj).encode(), extra=extra)

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", "0"))
            return self.rfile.read(n)

        def _route(self) -> list[str]:
            path = self.path.split("?", 1)[0]
            return [seg for seg in path.split("/") if seg]

        # --------------------------------------------------------- routes

        def do_POST(self):  # noqa: N802
            seg = self._route()
            try:
                if seg[:2] == ["api", "task"] and len(seg) == 2:
                    return self._post_task()
                if seg[:2] == ["api", "workspace"] and len(seg) == 2:
                    return self._post_workspace()
                if seg[:2] == ["api", "cache"] and len(seg) == 3:
                    return self._post_cache_alias(seg[2])
                self._send_json(404, {"error": "NotFound"})
            except Exception as e:  # noqa: BLE001
                self._send_json(
                    500, {"error": type(e).__name__, "message": str(e)}
                )

        def do_GET(self):  # noqa: N802
            seg = self._route()
            try:
                if seg[:2] == ["api", "task"] and len(seg) == 3:
                    return self._get_task(seg[2])
                if seg[:2] == ["api", "workspace"] and len(seg) == 2:
                    return self._send_json(200, server.ws_tree())
                if seg[:2] == ["api", "workspace"] and len(seg) > 2:
                    return self._get_workspace_file("/".join(seg[2:]))
                if seg[:2] == ["api", "cache"] and len(seg) == 2:
                    return self._send_json(200, server.memory_info())
                if seg == ["api", "cache", "clear"]:
                    server.spark.catalog.clearCache()
                    return self._send_json(200, "cleared")
                self._send_json(404, {"error": "NotFound"})
            except Exception as e:  # noqa: BLE001
                self._send_json(
                    500, {"error": type(e).__name__, "message": str(e)}
                )

        def do_DELETE(self):  # noqa: N802
            seg = self._route()
            try:
                if seg[:2] == ["api", "task"] and len(seg) == 3:
                    t = server.get_task(seg[2])
                    if t is None:
                        return self._send_json(404, {"error": "NotFound"})
                    t.interrupt()
                    return self._send_json(202, "accepted")
                if seg[:2] == ["api", "workspace"] and len(seg) > 2:
                    p = server.ws_path("/".join(seg[2:]))
                    if not os.path.exists(p) or not os.access(p, os.W_OK):
                        return self._send_json(404, {"error": "NotFound"})
                    shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
                    return self._send_json(200, "deleted")
                if seg[:2] == ["api", "cache"] and len(seg) == 3:
                    # items are Spark-managed persisted plans; eviction is
                    # catalog-level (InMemoryCache.remove analog)
                    server.spark.catalog.clearCache()
                    return self._send_json(200, "removed")
                self._send_json(404, {"error": "NotFound"})
            except Exception as e:  # noqa: BLE001
                self._send_json(
                    500, {"error": type(e).__name__, "message": str(e)}
                )

        # ----------------------------------------------------------- task

        def _post_task(self):
            tasks_json = json.loads(self._body().decode())
            if not isinstance(tasks_json, list):
                return self._send_json(
                    400, {"error": "BadRequest",
                          "message": "body must be a JSON task array"}
                )
            t = server.submit(tasks_json)
            self._send_json(
                202,
                {"id": t.id, "started": t.started, "messages": t.messages},
                extra={"Location": f"/api/task/{t.id}"},
            )

        def _get_task(self, task_id: str):
            t = server.get_task(task_id)
            if t is None:
                return self._send_json(404, {"error": "NotFound"})
            with t.lock:
                state, err = t.state, t.error
                msgs = list(t.messages)
            if state == "running":
                return self._send_json(
                    202,
                    {"id": t.id, "started": t.started, "messages": msgs},
                )
            if state in ("failed", "interrupted"):
                server.forget(t.id)
                return self._send_json(
                    500,
                    {"id": t.id, "started": t.started,
                     "finished": t.finished, "messages": msgs,
                     "error": err or state},
                )
            # done: stream with the reference's framing (Task.scala:55-60);
            # forget the task only AFTER a fully-delivered stream
            # (Behaviors.stopped after GetResult) — a mid-stream failure
            # keeps it retrievable, and once the body has started a 500
            # must NOT be written into the open chunked stream
            df = t.result_df
            header = json.dumps(
                {"id": t.id, "started": t.started, "finished": t.finished,
                 "messages": msgs}
            )[:-1]  # strip the trailing '}' exactly like the reference
            self.send_response(200)
            for k, v in self._headers().items():
                self.send_header(k, v)
            self.send_header("Content-Type", "application/json")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def chunk(data: bytes):
                self.wfile.write(f"{len(data):X}\r\n".encode())
                self.wfile.write(data)
                self.wfile.write(b"\r\n")

            try:
                chunk(header.encode() + b', "result": [')
                first = True
                for row_json in df.toJSON().toLocalIterator():
                    chunk((b"" if first else b",") + row_json.encode())
                    first = False
                chunk(b"]}")
                self.wfile.write(b"0\r\n\r\n")
            except Exception as e:  # noqa: BLE001 — body already started
                t.log(f"result stream aborted: {type(e).__name__}: {e}")
                self.close_connection = True
                return
            server.forget(t.id)

        # ------------------------------------------------------ workspace

        def _get_workspace_file(self, rel: str):
            p = server.ws_path(rel)
            if not os.path.isfile(p):
                return self._send_json(404, {"error": "NotFound"})
            with open(p, "rb") as f:
                data = f.read()
            self._send(200, data, ctype="application/octet-stream")

        def _post_workspace(self):
            ctype = self.headers.get("Content-Type", "")
            body = self._body()
            if ctype.startswith("multipart/form-data"):
                directory, fname, content = self._parse_multipart(
                    ctype, body
                )
            else:
                obj = json.loads(body.decode())
                directory = obj.get("directory")
                fname = obj.get("filename", "")
                content = obj.get("content", "").encode()
            if directory is None:
                return self._send_json(
                    400, {"error": "NoDirectoryField",
                          "message": "No 'directory' field was specified."}
                )
            if not fname:
                return self._send_json(
                    400, {"error": "NoUploadingFile",
                          "message": "No uploading file with name 'file' "
                                     "after the 'directory' field."}
                )
            target_dir = server.ws_path(directory) if directory else \
                server.workspace_dir
            os.makedirs(target_dir, exist_ok=True)
            with open(os.path.join(target_dir, os.path.basename(fname)),
                      "wb") as f:
                f.write(content)
            self._send_json(200, "uploaded")

        @staticmethod
        def _parse_multipart(ctype: str, body: bytes):
            msg = BytesParser(policy=email_default_policy).parsebytes(
                b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + body
            )
            directory = fname = None
            content = b""
            for part in msg.iter_parts():
                name = part.get_param(
                    "name", header="content-disposition"
                )
                if name == "directory":
                    directory = part.get_content().strip()
                elif name == "file":
                    fname = part.get_filename() or ""
                    payload = part.get_payload(decode=True)
                    content = payload if payload is not None else \
                        part.get_content().encode()
            return directory, fname, content

        # ---------------------------------------------------------- cache

        def _post_cache_alias(self, _cache_id: str):
            # form field "alias" (Cache.scala:27-33); cached DataFrames in
            # this engine are Spark-managed, aliasing is a metadata no-op
            from urllib.parse import parse_qs

            form = parse_qs(self._body().decode())
            alias = (form.get("alias", [""])[0] or "").strip()
            if not alias:
                return self._send_json(
                    400, {"error": "Validation",
                          "message": "Alias must be non-empty string."}
                )
            self._send_json(200, "added")

    return Handler


def main(argv: list[str] | None = None) -> None:
    """``python -m rdfrules_spark.http_service [port [workspace_dir]]`` —
    the reference's no-args ``runHttp`` server mode (Main.scala:96-101)."""
    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    port = int(args[0]) if args else 8851
    workspace = args[1] if len(args) > 1 else os.path.join(
        os.getcwd(), "workspace"
    )
    from rdfrules_spark.session import get_spark

    spark = get_spark("rdfrules-http-service")
    server = TaskServer(spark, workspace, port=port).start()
    print(f"RDFRules-Spark http server at {server.url} "
          f"(workspace: {workspace}); Ctrl-C to exit")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()
        print("RDFRules http server finished.")


if __name__ == "__main__":
    main()
