from klara_tpu.jobs.chain import Chain
from klara_tpu.jobs.job import MCJob, run
from klara_tpu.jobs.range import MCRange

__all__ = ["Chain", "MCJob", "MCRange", "run"]
