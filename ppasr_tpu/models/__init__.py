from ppasr_tpu.models.factory import build_model
