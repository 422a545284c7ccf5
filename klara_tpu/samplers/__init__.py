from klara_tpu.samplers.base import Info, Sampler, metropolis_accept
from klara_tpu.samplers.hmc import HMC, HMCState
from klara_tpu.samplers.mala import MALA, MALAState
from klara_tpu.samplers.mh import MH, MHState

__all__ = [
    "Info",
    "Sampler",
    "metropolis_accept",
    "MH",
    "MHState",
    "MALA",
    "MALAState",
    "HMC",
    "HMCState",
]
