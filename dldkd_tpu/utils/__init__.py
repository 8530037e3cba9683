from dldkd_tpu.utils.meters import AverageMeter
from dldkd_tpu.utils.logging import setup_logging, MetricsWriter
from dldkd_tpu.utils.provenance import make_code_zip

__all__ = ["AverageMeter", "setup_logging", "MetricsWriter", "make_code_zip"]
