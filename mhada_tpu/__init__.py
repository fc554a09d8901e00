"""mhada_tpu — TPU-native multi-head adaptive-attention (MHAda) style transfer.

A brand-new JAX/XLA/Pallas framework with the full capabilities of the PyTorch
reference `Maboroshi0327/MHAda-Style-Transfer` (see SURVEY.md): ViT content/style
encoders, the AdaFormer multi-head adaptive-attention decoder-transformer,
image/video training with temporal-consistency losses, streaming video
inference, and the complete evaluation harness.

Layout
------
- ``ops``       TPU kernel layer: exact-parity resize / reflect-pad conv /
                instance norm / grid-sample warp, and the fused Pallas MHAda
                attention kernel.
- ``models``    Model zoo (flax.linen): VGG19, VisionTransformer, AdaFormer,
                Decoder.
- ``data``      Host-side data pipelines: COCO×WikiArt, SceneFlow, Sintel,
                flow-file I/O.
- ``train``     Losses + jitted train steps (image & video), optax/orbax.
- ``infer``     Image / grid / streaming-video / latency drivers.
- ``evals``     LPIPS / SIFID / SSIM / histogram metrics + exps harnesses.
- ``parallel``  Mesh + sharding helpers (dp/tp over ICI).
- ``interop``   PyTorch ``.pth`` checkpoint reader and weight importers.

Internal conventions (TPU-first, intentionally different from the reference):
NHWC layout everywhere, float32 pixels in [0, 255] end-to-end (matching the
reference's pixel domain), functional modules, static shapes under jit.
"""

__version__ = "0.1.0"
