"""TPU compute-path ops: conv lowerings (ops.conv) and Pallas kernels
(ops.pallas). A regular package like every sibling — namespace-package
semantics would drop it from find_packages()-style discovery."""
