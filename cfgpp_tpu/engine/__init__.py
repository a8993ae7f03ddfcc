from cfgpp_tpu.engine.bundle import ModelBundle
from cfgpp_tpu.engine.callbacks import ComposeCallback, get_callback, register_callback
from cfgpp_tpu.engine.pipeline import DiffusionEngine

__all__ = ["ModelBundle", "DiffusionEngine", "ComposeCallback", "get_callback",
           "register_callback"]
