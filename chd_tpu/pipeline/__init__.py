from .run import run_pipeline, run_kinematic_stage, run_physics_stage
