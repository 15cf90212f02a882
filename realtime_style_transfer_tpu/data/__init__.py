"""Host-side data plane: decode, preprocess, pair, batch, prefetch.

Parity with the reference's ``dataloaders/`` package
(``/root/reference/realtime_style_transfer/dataloaders/common.py``,
``wikiart.py``, ``hdrScreenshots.py``, ``tensorbuffer.py``) re-designed for a
TPU host: pure numpy/PIL/ctypes — NO accelerator dispatch in this package
(the single exception is ``pipeline.DevicePrefetcher``, whose whole job is to
overlap the host->device copy with compute).

Submodules:

* ``imaging``       — resize/crop/load primitives (``common.py:23-96``)
* ``pipeline``      — split/pair/batch/cache/prefetch (``common.py:132-216``)
* ``wikiart``       — style corpus manager + dataset factories (``wikiart.py``)
* ``hdr_screenshots`` — Unreal G-buffer sets (``hdrScreenshots.py``)
* ``exr``           — first-party OpenEXR scanline *writer* (fixtures/tools)
* ``native``        — ctypes bindings for ``native/librst_native.so`` (EXR
  decode, threaded G-buffer batch loader, engine tensor buffers)

Import submodules directly (``from realtime_style_transfer_tpu.data import
pipeline``); nothing heavy is imported at package level.
"""
