// cpuenv — a C++ threaded vectorized environment stepper.
//
// The framework's envpool analog: the reference reaches C++ vectorized envs
// through the external envpool package (rl_games/envs/envpool.py); this
// in-tree native runtime provides the same role for host-side environments —
// batched stepping across a worker thread pool behind a flat C ABI consumed
// via ctypes (rl_games_tpu/envs/host/cpuenv.py).
//
// Contract per step (same_step autoreset, like the device JaxVecEnv):
//   step(actions) fills obs (post-autoreset), reward, done, timeout flags and
//   final_obs (the true pre-reset observation on done rows; equal to obs
//   elsewhere) — so both PPO (time_outs bootstrap) and SAC (true final
//   next_obs) consume it directly with no garbage rows.

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr float kPi = 3.14159265358979323846f;

struct EnvSpec {
  int obs_dim;
  int act_dim;      // continuous dims, or 1 slot for discrete action index
  bool discrete;
  int num_actions;  // discrete action count
  int max_steps;
};

// ---------------------------------------------------------------------------
// Single-env dynamics (match gymnasium CartPole-v1 / Pendulum-v1 exactly,
// like the pure-JAX twins in rl_games_tpu/envs/jax/classic.py)
// ---------------------------------------------------------------------------

class Env {
 public:
  virtual ~Env() = default;
  virtual void reset(std::mt19937& rng, float* obs) = 0;
  // returns reward; sets *terminated
  virtual float step(const float* action, std::mt19937& rng, float* obs,
                     bool* terminated) = 0;
};

class CartPole : public Env {
 public:
  static EnvSpec spec() { return {4, 1, true, 2, 500}; }

  void reset(std::mt19937& rng, float* obs) override {
    std::uniform_real_distribution<float> d(-0.05f, 0.05f);
    for (int i = 0; i < 4; ++i) s_[i] = d(rng);
    std::memcpy(obs, s_, sizeof(s_));
  }

  float step(const float* action, std::mt19937&, float* obs,
             bool* terminated) override {
    const float gravity = 9.8f, masscart = 1.0f, masspole = 0.1f;
    const float total_mass = masscart + masspole, length = 0.5f;
    const float polemass_length = masspole * length, force_mag = 10.0f;
    const float tau = 0.02f;
    const float theta_limit = 12.0f * 2.0f * kPi / 360.0f, x_limit = 2.4f;

    float x = s_[0], x_dot = s_[1], theta = s_[2], theta_dot = s_[3];
    float force = (action[0] > 0.5f) ? force_mag : -force_mag;
    float costheta = std::cos(theta), sintheta = std::sin(theta);
    float temp =
        (force + polemass_length * theta_dot * theta_dot * sintheta) /
        total_mass;
    float thetaacc =
        (gravity * sintheta - costheta * temp) /
        (length * (4.0f / 3.0f - masspole * costheta * costheta / total_mass));
    float xacc = temp - polemass_length * thetaacc * costheta / total_mass;
    s_[0] = x + tau * x_dot;
    s_[1] = x_dot + tau * xacc;
    s_[2] = theta + tau * theta_dot;
    s_[3] = theta_dot + tau * thetaacc;
    std::memcpy(obs, s_, sizeof(s_));
    *terminated =
        std::fabs(s_[0]) > x_limit || std::fabs(s_[2]) > theta_limit;
    return 1.0f;
  }

 private:
  float s_[4] = {0, 0, 0, 0};
};

class Pendulum : public Env {
 public:
  static EnvSpec spec() { return {3, 1, false, 0, 200}; }

  void reset(std::mt19937& rng, float* obs) override {
    std::uniform_real_distribution<float> dth(-kPi, kPi);
    std::uniform_real_distribution<float> dv(-1.0f, 1.0f);
    th_ = dth(rng);
    thdot_ = dv(rng);
    write_obs(obs);
  }

  float step(const float* action, std::mt19937&, float* obs,
             bool* terminated) override {
    const float max_speed = 8.0f, max_torque = 2.0f, dt = 0.05f;
    const float g = 10.0f, m = 1.0f, l = 1.0f;
    float u = std::fmax(-max_torque, std::fmin(max_torque, action[0]));
    float th_norm = angle_normalize(th_);
    float costs = th_norm * th_norm + 0.1f * thdot_ * thdot_ + 0.001f * u * u;
    float newthdot =
        thdot_ + (3.0f * g / (2.0f * l) * std::sin(th_) +
                  3.0f / (m * l * l) * u) *
                     dt;
    newthdot = std::fmax(-max_speed, std::fmin(max_speed, newthdot));
    th_ = th_ + newthdot * dt;
    thdot_ = newthdot;
    write_obs(obs);
    *terminated = false;
    return -costs;
  }

 private:
  static float angle_normalize(float a) {
    float r = std::fmod(a + kPi, 2.0f * kPi);
    if (r < 0) r += 2.0f * kPi;
    return r - kPi;
  }
  void write_obs(float* obs) {
    obs[0] = std::cos(th_);
    obs[1] = std::sin(th_);
    obs[2] = thdot_;
  }
  float th_ = 0, thdot_ = 0;
};

// ---------------------------------------------------------------------------
// Thread pool: persistent workers, chunked batch stepping
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) : stop_(false), pending_(0) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { worker_loop(); });
  }
  ~Pool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // run fn(i) for i in [0, count) across workers; blocks until done
  void parallel_for(int count, const std::function<void(int)>& fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      fn_ = &fn;
      next_ = 0;
      total_ = count;
      pending_ = count;
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
    fn_ = nullptr;
  }

 private:
  void worker_loop() {
    for (;;) {
      const std::function<void(int)>* fn = nullptr;
      int idx = -1;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || (fn_ && next_ < total_); });
        if (stop_) return;
        fn = fn_;
        idx = next_++;
      }
      (*fn)(idx);
      {
        std::unique_lock<std::mutex> lk(mu_);
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  bool stop_;
  const std::function<void(int)>* fn_ = nullptr;
  int next_ = 0, total_ = 0, pending_ = 0;
};

// ---------------------------------------------------------------------------
// Vectorized handle
// ---------------------------------------------------------------------------

struct VecEnv {
  EnvSpec spec;
  std::vector<std::unique_ptr<Env>> envs;
  std::vector<std::mt19937> rngs;
  std::vector<int> steps;
  std::unique_ptr<Pool> pool;
  int num_envs;
};

std::unique_ptr<Env> make_env(const std::string& name) {
  if (name == "CartPole-v1") return std::make_unique<CartPole>();
  if (name == "Pendulum-v1") return std::make_unique<Pendulum>();
  return nullptr;
}

EnvSpec spec_of(const std::string& name) {
  if (name == "CartPole-v1") return CartPole::spec();
  return Pendulum::spec();
}

}  // namespace

extern "C" {

void* cpuenv_create(const char* env_name, int num_envs, uint64_t seed,
                    int num_threads) {
  std::string name(env_name);
  if (!make_env(name)) return nullptr;
  auto* h = new VecEnv();
  h->spec = spec_of(name);
  h->num_envs = num_envs;
  for (int i = 0; i < num_envs; ++i) {
    h->envs.push_back(make_env(name));
    h->rngs.emplace_back(static_cast<uint32_t>(seed + 1315423911ull * i));
    h->steps.push_back(0);
  }
  if (num_threads <= 0)
    num_threads = std::max(1u, std::thread::hardware_concurrency());
  h->pool = std::make_unique<Pool>(num_threads);
  return h;
}

int cpuenv_obs_dim(void* vh) { return static_cast<VecEnv*>(vh)->spec.obs_dim; }
int cpuenv_act_dim(void* vh) { return static_cast<VecEnv*>(vh)->spec.act_dim; }
int cpuenv_discrete(void* vh) {
  return static_cast<VecEnv*>(vh)->spec.discrete ? 1 : 0;
}
int cpuenv_num_actions(void* vh) {
  return static_cast<VecEnv*>(vh)->spec.num_actions;
}
int cpuenv_max_steps(void* vh) {
  return static_cast<VecEnv*>(vh)->spec.max_steps;
}

void cpuenv_reset(void* vh, float* obs_out) {
  auto* h = static_cast<VecEnv*>(vh);
  int od = h->spec.obs_dim;
  h->pool->parallel_for(h->num_envs, [&](int i) {
    h->envs[i]->reset(h->rngs[i], obs_out + i * od);
    h->steps[i] = 0;
  });
}

void cpuenv_step(void* vh, const float* actions, float* obs_out,
                 float* rew_out, uint8_t* done_out, uint8_t* timeout_out,
                 float* final_obs_out) {
  auto* h = static_cast<VecEnv*>(vh);
  const int od = h->spec.obs_dim, ad = h->spec.act_dim;
  h->pool->parallel_for(h->num_envs, [&](int i) {
    float* obs = obs_out + i * od;
    float* fin = final_obs_out + i * od;
    bool terminated = false;
    rew_out[i] = h->envs[i]->step(actions + i * ad, h->rngs[i], obs,
                                  &terminated);
    h->steps[i] += 1;
    bool truncated = h->steps[i] >= h->spec.max_steps;
    bool done = terminated || truncated;
    done_out[i] = done ? 1 : 0;
    timeout_out[i] = (truncated && !terminated) ? 1 : 0;
    std::memcpy(fin, obs, od * sizeof(float));
    if (done) {  // same_step autoreset: obs becomes the new episode's first
      h->envs[i]->reset(h->rngs[i], obs);
      h->steps[i] = 0;
    }
  });
}

void cpuenv_destroy(void* vh) { delete static_cast<VecEnv*>(vh); }

}  // extern "C"
