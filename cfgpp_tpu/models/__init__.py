from cfgpp_tpu.models.clip import CLIPTextModel, CLIPTextOutput
from cfgpp_tpu.models.unet import UNet2DConditionModel
from cfgpp_tpu.models.vae import AutoencoderKL

__all__ = ["CLIPTextModel", "CLIPTextOutput", "UNet2DConditionModel", "AutoencoderKL"]
