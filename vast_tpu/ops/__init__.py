from vast_tpu.ops.attention import multi_head_attention
from vast_tpu.ops.fbank import kaldi_fbank
from vast_tpu.ops.image import normalize_image, preprocess_frames
from vast_tpu.ops.masking import mask_tokens
