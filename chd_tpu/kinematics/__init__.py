from .ik import solve_ck_ik, IKConfig
