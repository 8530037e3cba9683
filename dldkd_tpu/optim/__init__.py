from dldkd_tpu.optim.bert_adam import bert_adam, default_wd_mask
from dldkd_tpu.optim.ema import ema_init, ema_swap, ema_update
from dldkd_tpu.optim import schedules

__all__ = ["bert_adam", "default_wd_mask", "schedules",
           "ema_init", "ema_update", "ema_swap"]
