"""Shared test helpers (tiny checkpoint writers live in
mlimgsynth_tpu.testing so the native shim can use them too)."""
from mlimgsynth_tpu.testing import (  # noqa: F401
    TINY_CLIP, TINY_CLIP2, TINY_MODEL_TYPE, TINY_MODEL_TYPE_REFINER,
    TINY_MODEL_TYPE_SD2, TINY_MODEL_TYPE_XL, TINY_UNET, TINY_UNET_REFINER,
    TINY_UNET_V, TINY_UNET_XL, TINY_VAE,
    spec_to_checkpoint_arrays, spec_to_openclip_arrays, tiny_model_types,
    tiny_specs, write_checkpoint_refiner, write_checkpoint_sd2,
    write_checkpoint_sdxl, write_tiny_checkpoint, write_tiny_lora,
    write_tiny_tae)


def patch_tiny_model_types(monkeypatch, types=None):
    from mlimgsynth_tpu import api
    types = types or {"sd1": TINY_MODEL_TYPE}
    monkeypatch.setattr(api, "_model_types", lambda: dict(types))
