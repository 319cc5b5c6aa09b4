from gta_tpu.models.context import AttnContext, SceneBatch
from gta_tpu.models.layers import Attention, FeedForward, Transformer
from gta_tpu.models.encoder import SRTEncoder
from gta_tpu.models.decoder import SRTDecoder, RayPredictor
from gta_tpu.models.srt import SRT, TransformingSRT, build_model
