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
  float act_low = -1.0f;   // continuous action bounds
  float act_high = 1.0f;
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

class Acrobot : public Env {
  // gymnasium Acrobot-v1: two-link underactuated pendulum, RK4 at dt=0.2,
  // torque in {-1, 0, +1} on the second joint; -1 reward per step until the
  // tip swings above one link length.
 public:
  static EnvSpec spec() { return {6, 1, true, 3, 500}; }

  void reset(std::mt19937& rng, float* obs) override {
    std::uniform_real_distribution<float> d(-0.1f, 0.1f);
    for (int i = 0; i < 4; ++i) s_[i] = d(rng);
    write_obs(obs);
  }

  float step(const float* action, std::mt19937&, float* obs,
             bool* terminated) override {
    const float torque = static_cast<float>(static_cast<int>(action[0]) - 1);
    // one RK4 step of 0.2 s
    float y[4];
    std::memcpy(y, s_, sizeof(y));
    float k1[4], k2[4], k3[4], k4[4], t[4];
    deriv(y, torque, k1);
    for (int i = 0; i < 4; ++i) t[i] = y[i] + 0.1f * k1[i];
    deriv(t, torque, k2);
    for (int i = 0; i < 4; ++i) t[i] = y[i] + 0.1f * k2[i];
    deriv(t, torque, k3);
    for (int i = 0; i < 4; ++i) t[i] = y[i] + 0.2f * k3[i];
    deriv(t, torque, k4);
    for (int i = 0; i < 4; ++i)
      s_[i] = y[i] + 0.2f / 6.0f * (k1[i] + 2 * k2[i] + 2 * k3[i] + k4[i]);
    s_[0] = wrap(s_[0]);
    s_[1] = wrap(s_[1]);
    s_[2] = clampf(s_[2], -4.0f * kPi, 4.0f * kPi);
    s_[3] = clampf(s_[3], -9.0f * kPi, 9.0f * kPi);
    write_obs(obs);
    *terminated = (-std::cos(s_[0]) - std::cos(s_[1] + s_[0])) > 1.0f;
    return *terminated ? 0.0f : -1.0f;
  }

 private:
  static float clampf(float v, float lo, float hi) {
    return std::fmax(lo, std::fmin(hi, v));
  }
  static float wrap(float a) {
    float r = std::fmod(a + kPi, 2.0f * kPi);
    if (r < 0) r += 2.0f * kPi;
    return r - kPi;
  }
  static void deriv(const float* y, float torque, float* dy) {
    const float m1 = 1.0f, m2 = 1.0f, l1 = 1.0f, lc1 = 0.5f, lc2 = 0.5f;
    const float I1 = 1.0f, I2 = 1.0f, g = 9.8f;
    float th1 = y[0], th2 = y[1], dth1 = y[2], dth2 = y[3];
    float d1 = m1 * lc1 * lc1 +
               m2 * (l1 * l1 + lc2 * lc2 + 2 * l1 * lc2 * std::cos(th2)) +
               I1 + I2;
    float d2 = m2 * (lc2 * lc2 + l1 * lc2 * std::cos(th2)) + I2;
    float phi2 = m2 * lc2 * g * std::cos(th1 + th2 - kPi / 2.0f);
    float phi1 = -m2 * l1 * lc2 * dth2 * dth2 * std::sin(th2) -
                 2 * m2 * l1 * lc2 * dth2 * dth1 * std::sin(th2) +
                 (m1 * lc1 + m2 * l1) * g * std::cos(th1 - kPi / 2.0f) + phi2;
    float ddth2 =
        (torque + d2 / d1 * phi1 -
         m2 * l1 * lc2 * dth1 * dth1 * std::sin(th2) - phi2) /
        (m2 * lc2 * lc2 + I2 - d2 * d2 / d1);
    float ddth1 = -(d2 * ddth2 + phi1) / d1;
    dy[0] = dth1;
    dy[1] = dth2;
    dy[2] = ddth1;
    dy[3] = ddth2;
  }
  void write_obs(float* obs) {
    obs[0] = std::cos(s_[0]);
    obs[1] = std::sin(s_[0]);
    obs[2] = std::cos(s_[1]);
    obs[3] = std::sin(s_[1]);
    obs[4] = s_[2];
    obs[5] = s_[3];
  }
  float s_[4] = {0, 0, 0, 0};
};

class MountainCarContinuous : public Env {
  // gymnasium MountainCarContinuous-v0.
 public:
  static EnvSpec spec() { return {2, 1, false, 0, 999}; }

  void reset(std::mt19937& rng, float* obs) override {
    std::uniform_real_distribution<float> d(-0.6f, -0.4f);
    pos_ = d(rng);
    vel_ = 0.0f;
    obs[0] = pos_;
    obs[1] = vel_;
  }

  float step(const float* action, std::mt19937&, float* obs,
             bool* terminated) override {
    float force = std::fmax(-1.0f, std::fmin(1.0f, action[0]));
    vel_ += force * 0.0015f - 0.0025f * std::cos(3.0f * pos_);
    vel_ = std::fmax(-0.07f, std::fmin(0.07f, vel_));
    pos_ += vel_;
    if (pos_ < -1.2f) { pos_ = -1.2f; vel_ = 0.0f; }
    if (pos_ > 0.6f) pos_ = 0.6f;
    obs[0] = pos_;
    obs[1] = vel_;
    *terminated = pos_ >= 0.45f;
    float reward = -0.1f * force * force;
    if (*terminated) reward += 100.0f;
    return reward;
  }

 private:
  float pos_ = -0.5f, vel_ = 0.0f;
};

class Hopper2D : public Env {
  // A cheap planar one-leg hopper (SLIP-style): ballistic flight + spring
  // stance; actions = [thrust, lean]. Reward = forward velocity + alive
  // bonus; terminates when the body crashes. Not a MuJoCo clone — a
  // locomotion-shaped workload for the native stepper (the envpool-analog
  // role, rl_games/envs/envpool.py).
 public:
  static EnvSpec spec() { return {5, 2, false, 0, 1000}; }

  void reset(std::mt19937& rng, float* obs) override {
    std::uniform_real_distribution<float> d(-0.01f, 0.01f);
    x_ = 0; z_ = 1.1f + d(rng); vx_ = d(rng); vz_ = 0;
    write_obs(obs);
  }

  float step(const float* action, std::mt19937&, float* obs,
             bool* terminated) override {
    const float dt = 0.02f, g = 9.8f, k = 120.0f, leg = 1.0f, m = 1.0f;
    float thrust = std::fmax(0.0f, std::fmin(1.0f, action[0]));
    float lean = std::fmax(-0.4f, std::fmin(0.4f, action[1]));
    bool contact = z_ <= leg;
    float fz = -m * g, fx = 0.0f;
    if (contact) {
      float compress = leg - z_;
      // leg stiffness scales with thrust: an idle hopper sags below the
      // crash height, so staying alive requires active hopping
      float f_spring = k * (0.25f + 0.75f * thrust) * compress;
      // leaning the leg tilts the ground-reaction force forward
      fz += f_spring * std::cos(lean) - 4.0f * vz_;
      fx += f_spring * std::sin(lean) - 0.8f * vx_;
    }
    vx_ += dt * fx / m;
    vz_ += dt * fz / m;
    x_ += dt * vx_;
    z_ += dt * vz_;
    write_obs(obs);
    *terminated = z_ < 0.8f;
    return vx_ + 0.5f - 0.01f * thrust * thrust;
  }

 private:
  void write_obs(float* obs) {
    obs[0] = z_;
    obs[1] = vx_;
    obs[2] = vz_;
    obs[3] = z_ <= 1.0f ? 1.0f : 0.0f;
    obs[4] = std::fmin(5.0f, std::fmax(-5.0f, vz_));
  }
  float x_ = 0, z_ = 1.1f, vx_ = 0, vz_ = 0;
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
  if (name == "Acrobot-v1") return std::make_unique<Acrobot>();
  if (name == "MountainCarContinuous-v0")
    return std::make_unique<MountainCarContinuous>();
  if (name == "Hopper2D-v0") return std::make_unique<Hopper2D>();
  return nullptr;
}

EnvSpec spec_of(const std::string& name) {
  if (name == "CartPole-v1") return CartPole::spec();
  if (name == "Acrobot-v1") return Acrobot::spec();
  if (name == "MountainCarContinuous-v0") {
    EnvSpec sp = MountainCarContinuous::spec();
    sp.act_low = -1.0f;
    sp.act_high = 1.0f;
    return sp;
  }
  if (name == "Hopper2D-v0") {
    EnvSpec sp = Hopper2D::spec();
    sp.act_low = -1.0f;
    sp.act_high = 1.0f;
    return sp;
  }
  EnvSpec sp = Pendulum::spec();
  sp.act_low = -2.0f;
  sp.act_high = 2.0f;
  return sp;
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
float cpuenv_act_low(void* vh) {
  return static_cast<VecEnv*>(vh)->spec.act_low;
}
float cpuenv_act_high(void* vh) {
  return static_cast<VecEnv*>(vh)->spec.act_high;
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
