@echo off
rem Launcher for the softspoken_tpu CLI (Windows counterpart of scripts/softspoken;
rem plays the role of the reference's softspoken_launcher.bat for the headless CLI).
setlocal
set REPO_DIR=%~dp0..
set PYTHONPATH=%REPO_DIR%;%PYTHONPATH%
python -m softspoken_tpu %*
endlocal
