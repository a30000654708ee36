# Parity: reference configs/_base_/default_runtime.py. dist_params is
# accepted for config compatibility but unused — distribution is a JAX
# device mesh, not a process group.
checkpoint_config = dict(interval=1)
log_config = dict(
    interval=20,
    hooks=[
        dict(type='TextLoggerHook'),
    ])
# runtime settings
dist_params = dict(backend='jax')
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', 1)]
