from .mesh import make_mesh, commit_step, full_prove_step, sharded_prove_fn
