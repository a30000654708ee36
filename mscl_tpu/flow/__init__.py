from .pwclite import (PWCLite, cost_volume, flow_warp)
from .raft import (RAFT, BasicEncoder, bilinear_sampler,
                   build_corr_pyramid, load_torch_raft_weights,
                   lookup_corr, upsample_flow_convex)

__all__ = ['RAFT', 'BasicEncoder', 'bilinear_sampler',
           'build_corr_pyramid', 'lookup_corr', 'upsample_flow_convex',
           'load_torch_raft_weights', 'PWCLite', 'cost_volume', 'flow_warp']
