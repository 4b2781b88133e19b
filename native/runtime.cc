// Host runtime helpers: benchmark hygiene and system introspection.
//
// Counterpart of the reference's system layer
// (/root/reference/src/system.c): realtime scheduling + CPU affinity
// pinning for stable measurements (:305-351), page-fault counters
// (:353), cache/CPU geometry via sysconf
// (/root/reference/src/libdwt.c:20604-20638).

#include <cstdint>
#include <cstdio>
#include <cstring>

#ifdef __linux__
#include <sched.h>
#include <sys/resource.h>
#include <unistd.h>
#endif

extern "C" {

// Pin the calling thread to one CPU (dwt_util_env_single_threading's
// affinity part, /root/reference/src/system.c:475-514).  Returns 0 on
// success.
int ldt_set_affinity(int cpu) {
#ifdef __linux__
  cpu_set_t set;
  CPU_ZERO(&set);
  CPU_SET(cpu, &set);
  return sched_setaffinity(0, sizeof set, &set);
#else
  (void)cpu;
  return -1;
#endif
}

// Switch to SCHED_FIFO best priority if permitted
// (/root/reference/src/system.c:305-351).  Returns 0 on success.
int ldt_set_realtime(void) {
#ifdef __linux__
  sched_param p;
  std::memset(&p, 0, sizeof p);
  p.sched_priority = sched_get_priority_max(SCHED_FIFO);
  return sched_setscheduler(0, SCHED_FIFO, &p);
#else
  return -1;
#endif
}

// Major/minor page faults of this process
// (/root/reference/src/system.c:353).
int ldt_page_faults(int64_t* minor, int64_t* major) {
#ifdef __linux__
  rusage ru;
  if (getrusage(RUSAGE_SELF, &ru) != 0) return -1;
  *minor = ru.ru_minflt;
  *major = ru.ru_majflt;
  return 0;
#else
  (void)minor;
  (void)major;
  return -1;
#endif
}

// Host cache/CPU geometry (dwt_util_print_info analogue,
// /root/reference/src/libdwt.c:20604-20638).
int ldt_host_info(int64_t* n_cpus, int64_t* l1_size, int64_t* l1_line) {
#ifdef __linux__
  *n_cpus = sysconf(_SC_NPROCESSORS_ONLN);
#ifdef _SC_LEVEL1_DCACHE_SIZE
  *l1_size = sysconf(_SC_LEVEL1_DCACHE_SIZE);
  *l1_line = sysconf(_SC_LEVEL1_DCACHE_LINESIZE);
#else
  *l1_size = -1;
  *l1_line = -1;
#endif
  return 0;
#else
  return -1;
#endif
}

}  // extern "C"
