// 3d_aruco_eval: ChArUco-based ground-truth metrology for mesh evaluation.
//
// Native evaluation tool equivalent to the reference's
// gs_toolkit/evaluation/3d_aruco_eval (src/main.cpp:36-101, aruco_eval.cpp),
// re-implemented against the OpenCV 4 contrib ArUco API. Subcommands:
//   generate  <out.png> [squaresX squaresY squareLen markerLen]
//       write a ChArUco calibration board image
//   calibrate <out.yml> <img1> [img2 ...]
//       calibrate camera intrinsics from board views -> YAML
//   detect    <calib.yml> <image> [markerLen]
//       detect ArUco markers, print per-marker pose (rvec/tvec)
//   measure   <calib.yml> <image> <idA> <idB> <markerLen>
//       3D distance between two marker centers (ground-truth distance
//       for scale-checking reconstructed meshes)

#include <opencv2/aruco.hpp>
#include <opencv2/aruco/charuco.hpp>
#include <opencv2/calib3d.hpp>
#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>

#include <iostream>
#include <string>
#include <vector>

namespace {

constexpr int kSquaresX = 5;
constexpr int kSquaresY = 7;
constexpr float kSquareLen = 0.04f;  // meters
constexpr float kMarkerLen = 0.02f;

cv::Ptr<cv::aruco::Dictionary> dict() {
  return cv::aruco::getPredefinedDictionary(cv::aruco::DICT_5X5_100);
}

cv::Ptr<cv::aruco::CharucoBoard> board(int sx = kSquaresX, int sy = kSquaresY,
                                       float sq = kSquareLen,
                                       float mk = kMarkerLen) {
  return cv::aruco::CharucoBoard::create(sx, sy, sq, mk, dict());
}

int cmdGenerate(int argc, char **argv) {
  if (argc < 1) {
    std::cerr << "generate <out.png> [sx sy squareLen markerLen]\n";
    return 1;
  }
  int sx = argc > 1 ? std::atoi(argv[1]) : kSquaresX;
  int sy = argc > 2 ? std::atoi(argv[2]) : kSquaresY;
  float sq = argc > 3 ? std::atof(argv[3]) : kSquareLen;
  float mk = argc > 4 ? std::atof(argv[4]) : kMarkerLen;
  cv::Mat img;
  board(sx, sy, sq, mk)->draw(cv::Size(200 * sx, 200 * sy), img, 20, 1);
  cv::imwrite(argv[0], img);
  std::cout << "wrote board " << argv[0] << "\n";
  return 0;
}

int cmdCalibrate(int argc, char **argv) {
  if (argc < 2) {
    std::cerr << "calibrate <out.yml> <img1> [img2 ...]\n";
    return 1;
  }
  auto b = board();
  auto params = cv::aruco::DetectorParameters::create();
  std::vector<cv::Mat> allCorners, allIds;
  cv::Size imgSize;
  for (int i = 1; i < argc; i++) {
    cv::Mat img = cv::imread(argv[i], cv::IMREAD_GRAYSCALE);
    if (img.empty()) continue;
    imgSize = img.size();
    std::vector<std::vector<cv::Point2f>> corners;
    std::vector<int> ids;
    cv::aruco::detectMarkers(img, dict(), corners, ids, params);
    if (ids.empty()) continue;
    cv::Mat chCorners, chIds;
    cv::aruco::interpolateCornersCharuco(corners, ids, img, b, chCorners,
                                         chIds);
    if (chIds.total() >= 6) {
      allCorners.push_back(chCorners);
      allIds.push_back(chIds);
    }
  }
  if (allCorners.empty()) {
    std::cerr << "no usable board views\n";
    return 1;
  }
  cv::Mat K, d;
  std::vector<cv::Mat> rvecs, tvecs;
  double err = cv::aruco::calibrateCameraCharuco(
      allCorners, allIds, b, imgSize, K, d, rvecs, tvecs);
  cv::FileStorage fs(argv[0], cv::FileStorage::WRITE);
  fs << "camera_matrix" << K << "dist_coeffs" << d
     << "reprojection_error" << err;
  std::cout << "calibrated " << allCorners.size()
            << " views, reprojection error " << err << "\n";
  return 0;
}

bool loadCalib(const std::string &path, cv::Mat &K, cv::Mat &d) {
  cv::FileStorage fs(path, cv::FileStorage::READ);
  if (!fs.isOpened()) return false;
  fs["camera_matrix"] >> K;
  fs["dist_coeffs"] >> d;
  return !K.empty();
}

int cmdDetect(int argc, char **argv) {
  if (argc < 2) {
    std::cerr << "detect <calib.yml> <image> [markerLen]\n";
    return 1;
  }
  cv::Mat K, d;
  if (!loadCalib(argv[0], K, d)) {
    std::cerr << "cannot read calibration\n";
    return 1;
  }
  float markerLen = argc > 2 ? std::atof(argv[2]) : kMarkerLen;
  cv::Mat img = cv::imread(argv[1]);
  std::vector<std::vector<cv::Point2f>> corners;
  std::vector<int> ids;
  cv::aruco::detectMarkers(img, dict(), corners, ids);
  std::vector<cv::Vec3d> rvecs, tvecs;
  if (!ids.empty()) {
    cv::aruco::estimatePoseSingleMarkers(corners, markerLen, K, d, rvecs,
                                         tvecs);
  }
  for (size_t i = 0; i < ids.size(); i++) {
    std::cout << "marker " << ids[i] << " tvec " << tvecs[i][0] << " "
              << tvecs[i][1] << " " << tvecs[i][2] << " rvec " << rvecs[i][0]
              << " " << rvecs[i][1] << " " << rvecs[i][2] << "\n";
  }
  std::cout << "detected " << ids.size() << " markers\n";
  return 0;
}

int cmdMeasure(int argc, char **argv) {
  if (argc < 5) {
    std::cerr << "measure <calib.yml> <image> <idA> <idB> <markerLen>\n";
    return 1;
  }
  cv::Mat K, d;
  if (!loadCalib(argv[0], K, d)) {
    std::cerr << "cannot read calibration\n";
    return 1;
  }
  int idA = std::atoi(argv[2]), idB = std::atoi(argv[3]);
  float markerLen = std::atof(argv[4]);
  cv::Mat img = cv::imread(argv[1]);
  std::vector<std::vector<cv::Point2f>> corners;
  std::vector<int> ids;
  cv::aruco::detectMarkers(img, dict(), corners, ids);
  std::vector<cv::Vec3d> rvecs, tvecs;
  if (!ids.empty()) {
    cv::aruco::estimatePoseSingleMarkers(corners, markerLen, K, d, rvecs,
                                         tvecs);
  }
  cv::Vec3d ta, tb;
  bool hasA = false, hasB = false;
  for (size_t i = 0; i < ids.size(); i++) {
    if (ids[i] == idA) { ta = tvecs[i]; hasA = true; }
    if (ids[i] == idB) { tb = tvecs[i]; hasB = true; }
  }
  if (!hasA || !hasB) {
    std::cerr << "markers " << idA << "/" << idB << " not both visible\n";
    return 1;
  }
  std::cout << "distance_m: " << cv::norm(ta - tb) << "\n";
  return 0;
}

}  // namespace

int main(int argc, char **argv) {
  if (argc < 2) {
    std::cerr << "usage: aruco_eval <generate|calibrate|detect|measure> ...\n";
    return 1;
  }
  std::string cmd = argv[1];
  if (cmd == "generate") return cmdGenerate(argc - 2, argv + 2);
  if (cmd == "calibrate") return cmdCalibrate(argc - 2, argv + 2);
  if (cmd == "detect") return cmdDetect(argc - 2, argv + 2);
  if (cmd == "measure") return cmdMeasure(argc - 2, argv + 2);
  std::cerr << "unknown subcommand " << cmd << "\n";
  return 1;
}
