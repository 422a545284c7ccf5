from klara_tpu.samplers.am import AM, AMState
from klara_tpu.samplers.amwg import AMWG, AMWGState
from klara_tpu.samplers.ars import ARS, ARSState
from klara_tpu.samplers.base import Info, Sampler, metropolis_accept
from klara_tpu.samplers.hmc import HMC, HMCState
from klara_tpu.samplers.mala import MALA, MALAState
from klara_tpu.samplers.mh import MH, MHState
from klara_tpu.samplers.nuts import NUTS, NUTSState
from klara_tpu.samplers.ram import RAM, RAMState
from klara_tpu.samplers.slice_sampler import SliceSampler, SliceState
from klara_tpu.samplers.smmala import SMMALA, SMMALAState

__all__ = [
    "Info",
    "Sampler",
    "metropolis_accept",
    "MH",
    "MHState",
    "AM",
    "AMState",
    "RAM",
    "RAMState",
    "AMWG",
    "AMWGState",
    "ARS",
    "ARSState",
    "MALA",
    "MALAState",
    "SMMALA",
    "SMMALAState",
    "HMC",
    "HMCState",
    "NUTS",
    "NUTSState",
    "SliceSampler",
    "SliceState",
]
