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


def start_server(port: int):
    """Fork the viewer worker; returns the env side of the frame pipe."""
    try:
        import fastapi  # noqa: F401
        import uvicorn  # noqa: F401
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "The web viewer needs fastapi, uvicorn and pillow "
            f"(missing: {e.name}). Install them or use env.render() directly."
        ) from e
    mainproc_pipe, server_pipe = mp.Pipe()
    worker = _ServerWorker(server_pipe, port)
    worker.start()
    return mainproc_pipe
