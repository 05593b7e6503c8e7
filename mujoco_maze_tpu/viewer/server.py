"""Websocket viewer: stream env frames to a browser canvas.

Port of the reference's experimental web visualizer
(`/root/reference/mujoco_maze/websock_viewer.py`): ``start_server(port)``
forks a worker process serving a canvas page at ``/``, a frame websocket at
``/ws`` and an mp4 download at ``/video``; the env side sends RGB ndarrays
over a ``multiprocessing.Pipe`` (``None`` closes the server).

Frames come from the dependency-free software rasterizer
(:mod:`mujoco_maze_tpu.viewer.render2d`) instead of an OpenGL context, so
the viewer works on headless TPU hosts.  FastAPI/uvicorn/PIL are optional
extras — a clear error is raised if missing.
"""

from __future__ import annotations

import multiprocessing as mp

HTML = """
<!DOCTYPE html>
<html>
  <head><title>mujoco_maze_tpu visualizer</title></head>
  <body>
    <h2>mujoco_maze_tpu Visualizer</h2>
    <script>
      var ws_image = new WebSocket('ws://127.0.0.1:{{port}}/ws');
      ws_image.binaryType = "arraybuffer";
      ws_image.onmessage = function(event) {
          var canvas = document.getElementById('canvas');
          var ctx = canvas.getContext('2d');
          var blob = new Blob([event.data], {type:'image/png'});
          var url = URL.createObjectURL(blob);
          var image = new Image();
          image.onload = function() { ctx.drawImage(image, 0, 0); }
          image.src = url;
      }
    </script>
    <div><canvas id="canvas" width="1200" height="800"></canvas></div>
    <a href="video">Video</a>
  </body>
</html>
"""


class _ServerWorker(mp.Process):
    def __init__(self, pipe, port: int) -> None:
        super().__init__(daemon=True)
        self.pipe = pipe
        self.port = port
        self.video_frames = []

    def _run_server(self) -> None:
        import asyncio
        import io

        import fastapi
        import uvicorn
        from PIL import Image

        app = fastapi.FastAPI()
        html = HTML.replace("{{port}}", str(self.port))

        @app.get("/")
        async def root():
            return fastapi.responses.HTMLResponse(html)

        server = None

        @app.websocket("/ws")
        async def ws(websocket: fastapi.WebSocket):
            await websocket.accept()
            loop = asyncio.get_running_loop()
            while True:
                image_array = await loop.run_in_executor(None, self.pipe.recv)
                if image_array is None:
                    break
                self.video_frames.append(image_array)
                image = Image.fromarray(image_array)
                with io.BytesIO() as stream:
                    image.save(stream, format="png")
                    await websocket.send_bytes(stream.getvalue())
            await websocket.close()
            server.should_exit = True

        @app.get("/video")
        async def video():
            import imageio

            writer = imageio.get_writer("/tmp/mujoco-maze-tpu-video.mp4")
            for frame in self.video_frames:
                writer.append_data(frame)
            writer.close()
            return fastapi.responses.StreamingResponse(
                open("/tmp/mujoco-maze-tpu-video.mp4", mode="rb"),
                media_type="video/mp4",
            )

        config = uvicorn.Config(app, port=self.port)
        server = uvicorn.Server(config)
        server.run()

    def run(self) -> None:
        try:
            self._run_server()
        except KeyboardInterrupt:
            pass


_STDLIB_HTML = """
<!DOCTYPE html>
<html>
  <head><title>mujoco_maze_tpu visualizer</title></head>
  <body>
    <h2>mujoco_maze_tpu Visualizer</h2>
    <img src="/stream" />
    <div><a href="video">Video</a></div>
  </body>
</html>
"""


def _encode_video(frames):
    """Encode buffered frames: mp4 via imageio/ffmpeg when available
    (reference behavior, websock_viewer.py:78-87), else an animated GIF via
    PIL so ``/video`` always works on bare hosts."""
    import io

    if not frames:
        return b"no frames buffered yet", "text/plain"
    try:
        import tempfile

        import imageio

        with tempfile.NamedTemporaryFile(suffix=".mp4") as tmp:
            with imageio.get_writer(tmp.name, fps=50) as writer:
                for frame in frames:
                    writer.append_data(frame)
            tmp.seek(0)
            return tmp.read(), "video/mp4"
    except Exception:
        pass
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    buf = io.BytesIO()
    imgs[0].save(
        buf,
        format="gif",
        save_all=True,
        append_images=imgs[1:],
        duration=20,
        loop=0,
    )
    return buf.getvalue(), "image/gif"


class _StdlibServerWorker(mp.Process):
    """Dependency-free fallback: http.server + multipart PNG stream.

    Serves the same workflow as the FastAPI worker without fastapi/uvicorn —
    ``/`` shows a live <img>, ``/stream`` is a multipart/x-mixed-replace PNG
    stream, ``/video`` an mp4 of the buffered frames (parity with the
    reference ``/video`` endpoint, websock_viewer.py:78-87).  Works on bare
    TPU hosts.
    """

    def __init__(self, pipe, port: int) -> None:
        super().__init__(daemon=True)
        self.pipe = pipe
        self.port = port

    def run(self) -> None:
        import io
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        from PIL import Image

        state = {"frame": None, "closed": False}
        video_frames = []
        cond = threading.Condition()

        def pump():
            while True:
                arr = self.pipe.recv()
                with cond:
                    if arr is None:
                        state["closed"] = True
                        cond.notify_all()
                        return
                    video_frames.append(arr)
                    img = Image.fromarray(arr)
                    buf = io.BytesIO()
                    img.save(buf, format="png")
                    state["frame"] = buf.getvalue()
                    cond.notify_all()

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path == "/":
                    body = _STDLIB_HTML.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if self.path == "/video":
                    with cond:
                        frames = list(video_frames)
                    body, ctype = _encode_video(frames)
                    self.send_response(200)
                    self.send_header("Content-Type", ctype)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if self.path == "/stream":
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=frame",
                    )
                    self.end_headers()
                    last = None
                    while True:
                        with cond:
                            cond.wait_for(
                                lambda: state["closed"]
                                or (state["frame"] is not None and state["frame"] is not last)
                            )
                            if state["closed"]:
                                return
                            frame = state["frame"]
                            last = frame
                        try:
                            self.wfile.write(b"--frame\r\n")
                            self.wfile.write(b"Content-Type: image/png\r\n\r\n")
                            self.wfile.write(frame)
                            self.wfile.write(b"\r\n")
                        except (BrokenPipeError, ConnectionResetError):
                            return
                self.send_response(404)
                self.end_headers()

        server = ThreadingHTTPServer(("127.0.0.1", self.port), Handler)
        t = threading.Thread(target=pump, daemon=True)
        t.start()

        def watch_close():
            with cond:
                cond.wait_for(lambda: state["closed"])
            server.shutdown()

        threading.Thread(target=watch_close, daemon=True).start()
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass


def start_server(port: int):
    """Fork the viewer worker; returns the env side of the frame pipe.

    Prefers the FastAPI websocket worker (reference workflow); falls back to
    the stdlib multipart streamer when fastapi/uvicorn are absent.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            f"The web viewer needs pillow (missing: {e.name})."
        ) from e
    try:
        import fastapi  # noqa: F401
        import uvicorn  # noqa: F401

        worker_cls = _ServerWorker
    except ImportError:
        worker_cls = _StdlibServerWorker
    mainproc_pipe, server_pipe = mp.Pipe()
    worker = worker_cls(server_pipe, port)
    worker.start()
    return mainproc_pipe
