from lasso_tpu.linear import solvers, utils
from lasso_tpu.linear.dict_learning import (dict_evaluate, dict_learning,
                                            dict_learning_online,
                                            lasso_loss, update_dict,
                                            update_dict_block,
                                            update_dict_online,
                                            update_dict_ridge)
from lasso_tpu.linear.implicit import (implicit_sparse_encode,
                                       make_implicit_encoder,
                                       make_implicit_group_encoder)
from lasso_tpu.linear.path import lasso_path
from lasso_tpu.linear.screening import screen_atoms, screened_encode
from lasso_tpu.linear.sparse_encode import initialize_code, sparse_encode

__all__ = [
    "sparse_encode", "initialize_code", "implicit_sparse_encode",
    "make_implicit_encoder", "make_implicit_group_encoder",
    "dict_learning", "dict_evaluate",
    "dict_learning_online", "lasso_loss", "lasso_path", "update_dict",
    "update_dict_block", "update_dict_online", "update_dict_ridge",
    "screen_atoms", "screened_encode", "solvers", "utils",
]
