from gta_tpu.ops.reps import GeomReps, encoder_reps, decoder_reps
from gta_tpu.ops.gta import gta_attention, vecrep_attention
from gta_tpu.ops.attention import dot_product_attention, euclid_attention
