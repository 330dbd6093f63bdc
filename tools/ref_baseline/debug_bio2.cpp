// Step-by-step fitness trace of one reference solver on one target
// (reference-baseline harness debugging aid).
#include <cfloat>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <sstream>

#include "ik_base.h"
#include <bio_ik/goal_types.h>

using namespace bio_ik;

int main(int argc, char** argv)
{
    std::string spec = argv[1], targets_path = argv[2], mode = argv[3];
    std::string tip = argv[4];
    int steps = argc > 5 ? atoi(argv[5]) : 32;

    auto model = moveit::core::RobotModel::loadSpec(spec);
    moveit::core::RobotModelConstPtr model_c = model;
    auto jmg = moveit::core::JointModelGroup::allActive(*model);

    IKParams params;
    params.robot_model = model_c;
    params.joint_model_group = &jmg;
    params.solver_class_name = mode;
    params.enable_counter = false;
    params.thread_count = 1;
    params.random_seed = 42;
    params.dpos = DBL_MAX;
    params.drot = DBL_MAX;
    params.dtwist = 1e-3;
    params.opt_no_wipeout = false;
    params.population_size = 8;
    params.elite_count = 4;
    params.linear_fitness = false;

    std::ifstream tf(targets_path);
    std::string line;
    std::getline(tf, line);
    std::istringstream ss(line);
    std::string tag;
    ss >> tag;
    std::vector<double> seed;
    for(double v; ss >> v;)
        seed.push_back(v);
    std::getline(tf, line);
    std::istringstream ls(line);
    double px, py, pz, qx, qy, qz, qw;
    ls >> px >> py >> pz >> qx >> qy >> qz >> qw;

    PoseGoal goal;
    goal.setLinkName(tip);
    goal.setPosition(tf2::Vector3(px, py, pz));
    goal.setOrientation(tf2::Quaternion(qx, qy, qz, qw));
    std::vector<const Goal*> goals{&goal};

    Problem problem;
    problem.timeout = 0;
    problem.initial_guess = seed;
    problem.initialize(model_c, &jmg, params, goals, nullptr);

    auto solver = std::unique_ptr<IKSolver>(IKFactory::create(mode, params));
    solver->thread_index = 0;
    solver->initialize(problem);
    for(int i = 0; i < steps; i++)
    {
        solver->step();
        auto& result = solver->getSolution();
        auto& fk = solver->model;
        fk.applyConfiguration(result);
        double fit = solver->computeFitness(result, fk.getTipFrames());
        double perr =
            (fk.getTipFrames()[0].pos - tf2::Vector3(px, py, pz)).length();
        printf("step %3d fitness %.6e pos_err %.6e ok %d\n", i, fit, perr,
               (int)solver->checkSolution(result, fk.getTipFrames()));
    }
    return 0;
}
