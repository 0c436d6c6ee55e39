from mixedfem_tpu.integrators.bdf import BDFState, bdf_init, bdf_x_tilde, bdf_update, bdf_dt, BDF_ORDERS
