from dldkd_tpu.optim.bert_adam import bert_adam, default_wd_mask
from dldkd_tpu.optim import schedules

__all__ = ["bert_adam", "default_wd_mask", "schedules"]
